"""Bit-exact NumPy replica of Spark's exact ``percentile`` aggregate
(Catalyst ``Percentile.getPercentile``), for grouped pandas kernels that
evaluate quantiles in one pass over a sorted group (guide §4.2).

Why a replica instead of the built-in aggregate: the JVM Percentile
buffers a value→count OpenHashMap per group. On effectively-continuous
columns (594k distinct prices in 600k sf0.1 lineitem rows) partial
aggregation reduces nothing — every row's value crosses the exchange as a
map entry, and the final merge + sort runs single-threaded per group. A
grouped Arrow kernel ships the same bytes once, sorts with NumPy, and
evaluates every requested quantile from one sorted array.

The interpolation is replicated exactly: position ``(n-1)*p``,
``lower*(1-g) + higher*g`` — verified bitwise against Spark 4.1 on 2000
random groups (the lerp form ``lower + (higher-lower)*g`` differs in the
last ulp on ~3% of cases and would break oracle hash equality).
"""

from __future__ import annotations

import numpy as np


def spark_exact_percentile(sorted_vals: np.ndarray, p: float) -> float:
    """Exact percentile of an ascending float64 array, bit-identical to
    Spark's ``percentile(col, p)`` on the same multiset (NaN-free,
    non-empty)."""
    pos = (sorted_vals.size - 1) * p
    lo = int(pos)
    g = pos - lo
    if g == 0.0:
        return float(sorted_vals[lo])
    return float(sorted_vals[lo] * (1.0 - g) + sorted_vals[lo + 1] * g)


def sorted_non_nan(col) -> np.ndarray:
    """Ascending float64 copy of a pandas column with NaN (= SQL NULL under
    Arrow transfer) dropped — mirrors the aggregate's null skipping."""
    v = col.to_numpy(dtype=np.float64)
    return np.sort(v[~np.isnan(v)])

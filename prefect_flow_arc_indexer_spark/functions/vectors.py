"""Vector expressions over ``array<float>`` embedding columns.

Cosine similarity is computed JVM-side with ``zip_with`` + ``aggregate`` in
double precision (left-to-right fold — the same accumulation order DuckDB's
list aggregates use). Results that feed an oracle comparison are rounded to 6
decimals at the query layer to absorb any residual float drift.

Scale note: at 100 TB the brute-force form is a cross join — the LSH/IVF
variants in ``operators/similarity.py`` bucket first so each comparison list
is small and co-partitioned.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            _as_double(a), F.lit(0.0), lambda acc, v: acc + v * v
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dd_cosine_similarity(a: str, b: str) -> str:
    """Identical computation in DuckDB SQL (explicit, not
    list_cosine_similarity, so the accumulation order is pinned)."""
    d = (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}::DOUBLE[])[i] * ({b}::DOUBLE[])[i]), 'sum')"
    )
    na = f"sqrt(list_aggregate(list_transform({a}::DOUBLE[], x -> x * x), 'sum'))"
    nb = f"sqrt(list_aggregate(list_transform({b}::DOUBLE[], x -> x * x), 'sum'))"
    return f"({d}) / (({na}) * ({nb}))"

"""Vectorized Arrow kernels for the dedup family's tokenize → shingle →
stable-hash chain (optimization guide §4.2: do the heavy lifting in native
code inside ``mapInArrow``, hand whole batches to vectorized libraries).

The JVM expression form of this chain — ``split(lower(text), '\\s+')`` →
per-element ``concat_ws`` n-grams built from ``element_at`` → ``md5`` →
``conv(substring(...), 16, 10)`` — is the dominant per-task cost of the
MinHash/SimHash/n-gram-Jaccard operators (profiled ~1.0 s of the dedup
cascade's 2.6 s at sf0.1, plus one full re-evaluation per plan consumer).
These kernels compute the identical values per Arrow batch: Python's
``re``/``hashlib``/NumPy do the string work once per row, and the MinHash /
SimHash folds are NumPy ``reduceat`` segment reductions — no explode, no
per-shingle JVM expression tree, and for the signature kernels **no
exchange at all** (the per-doc aggregation is row-local by construction).

Semantics are bit-identical to the JVM forms on every value class the
corpus contains, replicated deliberately:

- ``tokens()``: Spark's ``split(lower(text), '\\s+')`` uses Java's ``\\s``
  — exactly ``[ \\t\\n\\x0B\\f\\r]`` (NOT Unicode-aware) — so the kernel
  splits on that explicit class rather than Python's Unicode ``\\s``/
  ``str.split``. Empty strings are filtered like the JVM ``filter``.
- ``stable_hash()``: first 7 hex chars of md5 as an int — computed here
  from the first 28 bits of the digest (``int.from_bytes(d[:4]) >> 4``),
  which is the same value (hex chars are big-endian nibbles). md5 operates
  on UTF-8 bytes in both engines.
- MinHash permutations ``(h*a + b) % P``: ``h < 2^28`` and ``a < P < 2^28``
  keep the product under ``2^56`` — exact in int64, no overflow wrap, and
  all operands non-negative so ``%`` agrees between Java and NumPy.
- Docs whose token stream yields NO shingles (NULL text, fewer than n
  tokens) emit no row — exactly the rows ``explode`` drops before the JVM
  ``groupBy``.

Every kernel's equivalence is pinned three ways: the pure-Python replica
unit tests (tests/test_round3_ops.py, test_extensions.py), the DuckDB
oracle of every consumer query (scripts/selfcheck.py), and the driver's
own oracle gate.
"""

from __future__ import annotations

import hashlib
import re
from typing import Callable, Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

from prefect_flow_arc_indexer_spark.functions.hashing import (
    HASH_PRIME,
    MINHASH_COEFFS,
)

# Java regex \s (non-Unicode): space, tab, newline, vertical tab, form
# feed, carriage return — the exact class Spark's split(lower(text), '\s+')
# tokenizer uses. Compiled once per Python worker process (module-level in
# an importable package, so reused workers keep it across tasks).
_WS_RE = re.compile("[ \t\n\x0b\f\r]+")

_MH_A = np.array([a for a, _ in MINHASH_COEFFS], dtype=np.int64)
_MH_B = np.array([b for _, b in MINHASH_COEFFS], dtype=np.int64)
_N_PERM = len(MINHASH_COEFFS)


def _tokens(text: str) -> list[str]:
    """Python replica of functions.textfns.tokens() (see module doc)."""
    return [t for t in _WS_RE.split(text.lower()) if t]


def _shingle_hashes_flat(
    toks: list[str], n: int, out: list[int]
) -> int:
    """Append the stable hash of every word n-gram of ``toks`` to ``out``
    (positional — duplicates kept); returns how many were appended."""
    md5 = hashlib.md5
    count = len(toks) - n + 1
    if count <= 0:
        return 0
    if n == 3:  # the SHINGLE_N hot path, loop-unrolled join
        for i in range(count):
            s = toks[i] + " " + toks[i + 1] + " " + toks[i + 2]
            out.append(
                int.from_bytes(md5(s.encode("utf-8")).digest()[:4], "big") >> 4
            )
    else:
        for i in range(count):
            s = " ".join(toks[i : i + n])
            out.append(
                int.from_bytes(md5(s.encode("utf-8")).digest()[:4], "big") >> 4
            )
    return count


def _map_batches(
    df: DataFrame,
    cols: list[str],
    schema: str,
    batch_fn: Callable[[pa.RecordBatch], pa.RecordBatch | None],
) -> DataFrame:
    """mapInArrow over an explicit projection (guide §4.1: Spark cannot see
    which columns an opaque function touches — select first so pruning and
    pushdown still reach the scan)."""

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            out = batch_fn(batch)
            if out is not None and out.num_rows:
                yield out

    return df.select(*cols).mapInArrow(run, schema)


# --------------------------------------------------------------------------
# MinHash signature kernel
# --------------------------------------------------------------------------
def _id_keyed_schema(docs: DataFrame, value_fields: list[str]) -> StructType:
    """Output schema carrying the INPUT's doc_id type (the kernels are
    generic in the id like the JVM forms they replace — tests use string
    ids) plus bigint value columns."""
    id_field = docs.schema["doc_id"]
    return StructType(
        [StructField("doc_id", id_field.dataType, id_field.nullable)]
        + [StructField(f, LongType(), True) for f in value_fields]
    )


def minhash_signatures_arrow(docs: DataFrame, shingle_n: int) -> DataFrame:
    """(doc_id, m0..m15) computed row-locally per Arrow batch.

    Replaces explode → md5/conv per shingle → partial agg → Exchange →
    16-way min aggregate with ONE narrow map: the signature never shuffles
    (the only exchange left in a consumer is whatever IT does downstream,
    e.g. the LSH band groupBy). MinHash min() is duplicate-insensitive, so
    shingles are hashed positionally with no per-doc distinct, exactly like
    the ``distinct=False`` JVM path this supersedes.
    """
    schema = _id_keyed_schema(docs, [f"m{i}" for i in range(_N_PERM)])

    def per_batch(batch: pa.RecordBatch) -> pa.RecordBatch | None:
        texts = batch.column(1).to_pylist()
        keep: list[int] = []
        starts: list[int] = []
        flat: list[int] = []
        for row, tx in enumerate(texts):
            if tx is None:
                continue
            pos = len(flat)
            if _shingle_hashes_flat(_tokens(tx), shingle_n, flat):
                starts.append(pos)
                keep.append(row)
        if not keep:
            return None
        h = np.asarray(flat, dtype=np.int64)
        st = np.asarray(starts, dtype=np.int64)
        # take() keeps the id column's Arrow type exactly as it arrived
        arrays = [batch.column(0).take(pa.array(keep, type=pa.int32()))]
        for i in range(_N_PERM):
            perm = (h * _MH_A[i] + _MH_B[i]) % HASH_PRIME
            arrays.append(pa.array(np.minimum.reduceat(perm, st)))
        return pa.RecordBatch.from_arrays(
            arrays, ["doc_id"] + [f"m{i}" for i in range(_N_PERM)]
        )

    return _map_batches(docs, ["doc_id", "text"], schema, per_batch)


# --------------------------------------------------------------------------
# SimHash fingerprint kernel
# --------------------------------------------------------------------------
def simhash_arrow(docs: DataFrame, n_bits: int) -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over the doc's DISTINCT
    word-unigram hashes, fully row-local (the JVM form exploded the token
    set and shuffled 28 conditional sums through a groupBy)."""
    shifts = np.arange(n_bits, dtype=np.int64)
    weights = (np.int64(1) << shifts).astype(np.int64)
    schema = _id_keyed_schema(docs, ["simhash"])

    def per_batch(batch: pa.RecordBatch) -> pa.RecordBatch | None:
        texts = batch.column(1).to_pylist()
        md5 = hashlib.md5
        keep: list[int] = []
        starts: list[int] = []
        flat: list[int] = []
        for row, tx in enumerate(texts):
            if tx is None:
                continue
            toks = _tokens(tx)
            if not toks:
                continue
            starts.append(len(flat))
            keep.append(row)
            for w in set(toks):
                flat.append(
                    int.from_bytes(md5(w.encode("utf-8")).digest()[:4], "big")
                    >> 4
                )
        if not keep:
            return None
        h = np.asarray(flat, dtype=np.int64)
        st = np.asarray(starts, dtype=np.int64)
        # votes[d, b] = sum over the doc's hashes of (bit b ? +1 : -1)
        bits = (h[:, None] >> shifts) & 1
        votes = np.add.reduceat(2 * bits - 1, st, axis=0)
        fp = ((votes > 0) * weights).sum(axis=1, dtype=np.int64)
        return pa.RecordBatch.from_arrays(
            [
                batch.column(0).take(pa.array(keep, type=pa.int32())),
                pa.array(fp),
            ],
            ["doc_id", "simhash"],
        )

    return _map_batches(docs, ["doc_id", "text"], schema, per_batch)

"""Data-layout operators: clustering keys and equal-frequency binning.

At 100 TB the dominant cost of every query in this repo is the scan, and the
scan's cost is set by LAYOUT — which files a predicate can skip. These
operators compute the two standard layout keys:

- `q_zorder_key`: Morton (Z-order) interleave of two scan dimensions.
  Writing the table sorted by this key gives multi-dimensional data
  skipping: parquet row-group min/max on BOTH source columns stay tight, so
  a predicate on either column (or a box on both) prunes row groups — the
  technique behind Delta/Iceberg OPTIMIZE ZORDER. The key itself is pure
  row-local bit arithmetic, identical on both engines.
- `q_quantile_bins`: equal-frequency (ntile) binning per group with bin
  summaries — the feature-bucketization step (quantile sketch -> bin id)
  of a feature pipeline, and the partition-boundary computation of a range
  writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table

ZORDER_BITS = 16
ZORDER_EPOCH = "1992-01-01"


def _interleave_sql(x: str, y: str, shift_fmt: str) -> str:
    """SQL for bit-interleaving two ZORDER_BITS-wide ints; ``shift_fmt``
    abstracts the dialect's shift syntax ('spark' or 'duckdb')."""
    terms = []
    for i in range(ZORDER_BITS):
        if shift_fmt == "spark":
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "q_zorder_key",
    oracle=f"""WITH dims AS (
  SELECT o_orderkey,
         CAST(datediff('day', DATE '{ZORDER_EPOCH}', CAST(o_orderdate AS DATE))
              AS BIGINT) & {(1 << ZORDER_BITS) - 1} AS x,
         CAST(o_custkey AS BIGINT) & {(1 << ZORDER_BITS) - 1} AS y
    FROM orders
)
SELECT o_orderkey, x, y,
       CAST({_interleave_sql("x", "y", "duckdb")} AS BIGINT) AS zkey
  FROM dims
""",
    doc="Z-order (Morton) clustering key over the two hottest orders scan "
    f"dimensions (order date as days since {ZORDER_EPOCH}, customer key), "
    f"{ZORDER_BITS} bits each interleaved into one 32-bit key — sort the "
    "table by zkey at write time and row-group min/max stats prune on "
    "EITHER dimension (the Delta/Iceberg OPTIMIZE ZORDER technique). "
    "Row-local bit arithmetic, zero shuffle, bit-identical across engines",
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mask = (1 << ZORDER_BITS) - 1
    dims = orders.select(
        "o_orderkey",
        (
            F.datediff(F.to_date("o_orderdate"), F.lit(ZORDER_EPOCH))
            .cast("bigint")
            .bitwiseAND(F.lit(mask))
        ).alias("x"),
        F.col("o_custkey").cast("bigint").bitwiseAND(F.lit(mask)).alias("y"),
    )
    return dims.select(
        "o_orderkey",
        "x",
        "y",
        F.expr(_interleave_sql("x", "y", "spark"))
        .cast("bigint")
        .alias("zkey"),
    )


QBIN_N = 10


@register(
    "q_quantile_bins",
    oracle=f"""WITH binned AS (
  SELECT l_returnflag, l_extendedprice,
         ntile({QBIN_N}) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice ASC,
                                        l_orderkey ASC,
                                        l_linenumber ASC) AS bin
    FROM lineitem
)
SELECT l_returnflag, bin,
       count(*) AS n_items,
       round(min(l_extendedprice), 2) AS bin_min,
       round(max(l_extendedprice), 2) AS bin_max
  FROM binned GROUP BY l_returnflag, bin
""",
    doc=f"equal-frequency binning: ntile({QBIN_N}) per return flag over a "
    "fully tie-broken order (price, orderkey, linenumber — total order => "
    "identical bin assignment on both engines), then per-bin count/min/max "
    "— the quantile-bucketization step of a feature pipeline and the "
    "boundary computation of a range-partitioned writer. Executed WITHOUT "
    "the row-level ntile window (which hash-clusters the whole corpus on "
    "l_returnflag — 3 groups => 3 corpus-sized sort tasks no matter how "
    "many executors exist, the q_zipf_fit single-task-sort class): every "
    "output cell is determined by the per-price COUNTS alone. n_items is "
    "closed-form ntile arithmetic from the per-flag total, and "
    "bin_min/bin_max are the prices whose cumulative-rank interval "
    "intersects the bin's rank interval — value-at-rank depends only on "
    "how many rows hold each price, never on the tie-break order, so the "
    "total order contributes nothing to the values. Plan: map-side-"
    "combined groupBy(flag, price) count (full scan parallelism), then a "
    "cumsum + bin-interval explode over the DOMAIN-bounded histogram "
    "(594k distinct (flag, price) at sf1 AND sf0.1 — 2-dp currency "
    "saturates; the q_ks_drift/q_length_trim histogram-window class, "
    "partitioned by flag), then a 30-group re-aggregate. No corpus-sized "
    "sort at any scale; q_approx_percentiles is the sketch fallback for "
    "value domains that genuinely don't saturate. Oracle keeps the ntile "
    "window as the exact-semantics reference definition",
)
def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count("*").alias("cnt")
    )
    wflag = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "l_extendedprice",
        "cnt",
        F.sum("cnt")
        .over(wflag.orderBy("l_extendedprice"))
        .alias("cum"),
        F.sum("cnt").over(wflag).alias("n"),
    )
    # ntile bucket arithmetic: q = n div N, rem = n mod N; bins 1..rem get
    # q+1 rows. bin_of(rank) inverts it (q == 0 <=> n < N => unit bins);
    # all-integer `div` so the inversion is exact at any n. A price covers
    # ranks (cum-cnt, cum]; it contributes min/max to every bin its
    # interval intersects — at most N bins, via one tiny explode.
    def bin_of(rank: str) -> str:
        q, rem = f"(n div {QBIN_N})", f"(n % {QBIN_N})"
        return (
            f"CAST(CASE WHEN n < {QBIN_N} THEN {rank} "
            f"WHEN {rank} <= {rem} * ({q} + 1) "
            f"THEN ({rank} + {q}) div ({q} + 1) "
            f"ELSE {rem} + ({rank} - {rem} * ({q} + 1) + {q} - 1) div {q} "
            f"END AS INT)"
        )

    spans = cum.withColumn(
        "lo_rank", F.col("cum") - F.col("cnt") + 1
    ).select(
        "l_returnflag",
        "l_extendedprice",
        "n",
        F.explode(
            F.expr(f"sequence({bin_of('lo_rank')}, {bin_of('cum')})")
        ).alias("bin"),
    )
    # n_items closed-form from the same arithmetic (n rides along on every
    # row — constant within a flag, so max() just reads it back)
    n_items = F.expr(
        f"max(n) div {QBIN_N} "
        f"+ CAST(bin <= max(n) % {QBIN_N} AS BIGINT)"
    )
    return spans.groupBy("l_returnflag", "bin").agg(
        n_items.alias("n_items"),
        F.round(F.min("l_extendedprice"), 2).alias("bin_min"),
        F.round(F.max("l_extendedprice"), 2).alias("bin_max"),
    )


HILBERT_BITS = 16


def hilbert_d(x: int, y: int, bits: int = HILBERT_BITS) -> int:
    """Reference scalar Hilbert xy->d (the classic rotate-and-fold walk).
    Tests and the executor kernel share this module as the single source of
    the curve definition."""
    rx = ry = 0
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def _hilbert_batches(batches):
    import numpy as np
    import pandas as pd

    for pdf in batches:
        x = pdf["x"].to_numpy(dtype=np.int64).copy()
        y = pdf["y"].to_numpy(dtype=np.int64).copy()
        d = np.zeros_like(x)
        s = np.int64(1 << (HILBERT_BITS - 1))
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate the quadrant frame (vectorized branch-free form)
            flip = (ry == 0) & (rx == 1)
            x_f = np.where(flip, s - 1 - x, x)
            y_f = np.where(flip, s - 1 - y, y)
            swap = ry == 0
            x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
            s >>= 1
        out = pdf.copy()
        out["hkey"] = d
        yield out


@register(
    "q_hilbert_key",
    # exact oracle since r6: the rotate-and-fold walk is a FIXED 16-step
    # loop, so a recursive CTE carrying (x0, y0, x, y, d, s) unrolls it
    # exactly — every branch is integer CASE arithmetic, xor() included,
    # so the key matches the numpy kernel bit-for-bit. (Previously
    # rows-only; tests additionally pin bijectivity and unit-step
    # adjacency, which the oracle alone wouldn't prove.)
    oracle=f"""WITH RECURSIVE dims AS (
  SELECT o_orderkey,
         CAST(datediff('day', DATE '{ZORDER_EPOCH}', CAST(o_orderdate AS DATE))
              AS BIGINT) & {(1 << HILBERT_BITS) - 1} AS x,
         CAST(o_custkey AS BIGINT) & {(1 << HILBERT_BITS) - 1} AS y
    FROM orders
),
walk AS (
  SELECT o_orderkey, x AS x0, y AS y0, x, y,
         CAST(0 AS BIGINT) AS d,
         CAST({1 << (HILBERT_BITS - 1)} AS BIGINT) AS s
    FROM dims
  UNION ALL
  SELECT o_orderkey, x0, y0,
         CASE WHEN ry = 0 THEN y_f ELSE x_f END,
         CASE WHEN ry = 0 THEN x_f ELSE y_f END,
         d + s * s * xor(3 * rx, ry),
         s // 2
    FROM (
      SELECT o_orderkey, x0, y0, d, s,
             CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END AS rx,
             CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END AS ry,
             CASE WHEN (y & s) = 0 AND (x & s) > 0
                  THEN s - 1 - x ELSE x END AS x_f,
             CASE WHEN (y & s) = 0 AND (x & s) > 0
                  THEN s - 1 - y ELSE y END AS y_f
        FROM walk WHERE s > 0
    )
)
SELECT o_orderkey, x0 AS x, y0 AS y, d AS hkey
  FROM walk WHERE s = 0
""",
    doc="Hilbert clustering key over the same two orders dimensions as "
    "q_zorder_key, via a vectorized numpy kernel in mapInPandas (Arrow "
    "batches; per-row Python never runs). Hilbert beats Z-order on range "
    "locality: CONSECUTIVE keys are always adjacent cells (no quadrant "
    "jumps), so a key-range file maps to one compact spatial blob and "
    "box predicates touch fewer files — the reason newer table formats "
    "offer Hilbert alongside Z-order. Same write-time contract: sort by "
    "hkey, prune row groups on either dimension",
)
def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mask = (1 << HILBERT_BITS) - 1
    dims = orders.select(
        "o_orderkey",
        (
            F.datediff(F.to_date("o_orderdate"), F.lit(ZORDER_EPOCH))
            .cast("bigint")
            .bitwiseAND(F.lit(mask))
        ).alias("x"),
        F.col("o_custkey").cast("bigint").bitwiseAND(F.lit(mask)).alias("y"),
    )
    return dims.mapInPandas(
        _hilbert_batches, schema="o_orderkey long, x long, y long, hkey long"
    )


# --------------------------------------------------------------------------
# shard balancing: snake assignment by global size rank, two-pass rank
# --------------------------------------------------------------------------
SHARDS = 8
RANK_PARTS = 8  # range partitions for the distributed global rank


@register(
    "q_shard_balance",
    oracle=f"""WITH t AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN 0
              ELSE len(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '')) END AS n_tokens
    FROM documents
),
r AS (
  SELECT n_tokens,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) AS rnk
    FROM t
),
s AS (
  SELECT n_tokens,
         CASE WHEN ((rnk - 1) // {SHARDS}) % 2 = 0 THEN (rnk - 1) % {SHARDS}
              ELSE {SHARDS - 1} - ((rnk - 1) % {SHARDS}) END AS shard
    FROM r
)
SELECT CAST(shard AS INTEGER) AS shard,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM s GROUP BY shard
""",
    doc=f"training-shard balancing: docs ranked globally by token count "
    f"(desc, doc_id ties) and dealt into {SHARDS} shards in a snake "
    "(boustrophedon) pattern, the deterministic near-optimal balancer. "
    "The global rank is the scale-honest TWO-PASS form — repartitionByRange "
    "on the sort key, per-partition row_number, plus a broadcast of the "
    "tiny per-partition offsets — never a single-task global window. The "
    "rank values are identical regardless of where sampling places range "
    "boundaries (the composite key is unique), so the output is "
    "deterministic and engine-stable.",
)
def q_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefect_flow_arc_indexer_spark.functions.textfns import tokens
    from prefect_flow_arc_indexer_spark.operators.distrank import (
        global_rank,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=True).select(
        "doc_id",
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(tokens(F.col("text"))))
        .alias("n_tokens"),
    )
    # shared two-pass helper (checkpointed partitioning — see distrank's
    # branch-consistency note; the inline form this replaced was exposed
    # to independent range-boundary sampling between its two branches)
    ranked = global_rank(
        docs,
        [F.col("n_tokens").desc(), F.col("doc_id").asc()],
        "rnk",
        num_parts=RANK_PARTS,
    )
    shard = F.expr(
        f"CASE WHEN ((rnk - 1) div {SHARDS}) % 2 = 0 THEN (rnk - 1) % {SHARDS} "
        f"ELSE {SHARDS - 1} - ((rnk - 1) % {SHARDS}) END"
    ).cast("int")
    return (
        ranked.select(shard.alias("shard"), "n_tokens")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# --------------------------------------------------------------------------
# write planning: target-size file bin packing (small-file compaction)
# --------------------------------------------------------------------------
BIN_TARGET_BYTES = 64_000  # stand-in for the production 128-256 MB target


@register(
    "q_write_bins",
    oracle=f"""WITH sized AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_chars AS start_off
    FROM documents WHERE n_chars IS NOT NULL
)
SELECT source,
       CAST(start_off // {BIN_TARGET_BYTES} AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS bin_bytes,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
  FROM sized
 GROUP BY source, bin_id
""",
    doc="write planning: pack each source's docs (in doc_id order) into "
    f"target-size output files of ~{BIN_TARGET_BYTES} bytes by cumulative "
    "start offset — the small-file-compaction / OPTIMIZE planner every "
    "100 TB table needs. bin_id = floor(running-start / target) keeps "
    "every file under target+max_doc bytes with zero look-ahead: the "
    "assignment is a per-source window cumsum (one partitioned exchange, "
    "no global sort), and at production scale the same expression runs "
    "over the file-metadata table (path, size) instead of row bytes.",
)
def q_write_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True).where(
        F.col("n_chars").isNotNull()
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (F.sum("n_chars").over(w) - F.col("n_chars")).alias("start_off"),
    )
    return (
        sized.groupBy(
            "source",
            F.floor(F.col("start_off") / BIN_TARGET_BYTES)
            .cast("bigint")
            .alias("bin_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("bin_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )

"""Distributed global ordering primitives — the scale-honest replacement
for ``Window.orderBy(...)`` with an empty partition spec.

A window with no PARTITION BY collapses the whole input into ONE task
(Spark warns "No Partition Defined for Window"); at corpus cardinality that
is a single-executor sort of the entire table. Both helpers here compute
the identical result in the classic two-pass form:

1. ``repartitionByRange`` on the total order (parallel range sort);
2. per-partition ``row_number``/running-sum under a window PARTITIONED by
   ``spark_partition_id()`` (parallel, bounded state);
3. per-partition counts/sums → exclusive prefix offsets over the (tiny,
   = #partitions rows) offset table, broadcast back and added.

The only unpartitioned window left is step 3's, over ``_pid`` — bounded by
the partition count, which is exactly the exemption
``scripts/explain_audit.py`` encodes (order column ``pid``/``_pid``).

The pattern first shipped for q_shard_balance / q_rank_fusion
(``curation._global_rank``); this module is the generalized, reusable form
(VERDICT r4 task 1: q_rfm_segments, q_weighted_sample, q_pack_sequences,
q_conformal_threshold now route through it).

CRITICAL consistency detail: the per-partition frame is localCheckpoint'ed
before the offsets aggregation. Both consumers (the ranked rows and the
offset table) would otherwise re-plan the range exchange independently,
and Catalyst's column pruning can make the two exchange subplans differ —
defeating ReuseExchange — so the two RangePartitioners SAMPLE different
boundaries and ``spark_partition_id`` no longer aligns between branches
(observed at sf0.1: a silently wrong cumsum whenever the caller carried an
extra column). The checkpoint pins one materialized partitioning that both
branches read; at 100 TB that one write of the range-sorted narrow table
to executor-local disk is the standard price of a stable distributed sort
(Spark's own zipWithIndex runs the same two-job shape).

Correctness note on ties: callers must pass a TOTAL order (append a unique
id as the last sort key). ``repartitionByRange`` places equal keys in the
same range partition, so with a total order no rank/sum can straddle a
boundary ambiguously — results are identical to the single-window form
regardless of where the sampled range boundaries land.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Default range-partition fan-out for the parallel sort. Small SFs fit in a
# handful; at 100 TB callers raise it (or rely on AQE coalescing the tail).
DEFAULT_PARTS = 8


def _offsets(local: DataFrame, agg: Column) -> DataFrame:
    """Per-partition ``agg`` → exclusive running offset (bounded: one row
    per range partition)."""
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    return (
        local.groupBy("_pid")
        .agg(agg.alias("_n"))
        .withColumn("_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0)))
        .select("_pid", "_off")
    )


def global_rank(
    df: DataFrame,
    order: list[Column],
    out_col: str = "rnk",
    num_parts: int = DEFAULT_PARTS,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order)`` without a single-task sort:
    all input columns are preserved, ``out_col`` (1-based bigint) added.
    ``order`` must be a total order (unique last key)."""
    parted = df.repartitionByRange(num_parts, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_pid").orderBy(*order)
    # checkpoint: offsets + output must see ONE materialized partitioning
    # (see module docstring — independent exchanges may sample different
    # range boundaries and misalign _pid between the two branches)
    local = parted.withColumn(
        "_lr", F.row_number().over(local_w)
    ).localCheckpoint(eager=False)
    offs = _offsets(local, F.count(F.lit(1)))
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, (F.col("_lr") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_lr", "_off")
    )


def global_cumsum(
    df: DataFrame,
    value: Column,
    order: list[Column],
    out_col: str = "cum",
    num_parts: int = DEFAULT_PARTS,
) -> DataFrame:
    """Inclusive running sum of ``value`` along the total order ``order``,
    two-pass. NULL values count as 0 (callers that must distinguish an
    all-NULL prefix — SQL window semantics yield NULL there — should filter
    NULLs first; every registered consumer discards NULL-valued rows via
    its own arithmetic, so the results are engine-identical)."""
    v = F.coalesce(value, F.lit(0))
    parted = df.repartitionByRange(num_parts, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # checkpoint for the same branch-consistency reason as global_rank;
    # carry the coalesced value so the offsets sum reads the CHECKPOINTED
    # rows (summing the raw column again would re-derive nothing wrong,
    # but keeping every consumer on one materialization is the contract)
    local = parted.withColumn("_v", v).withColumn(
        "_lc", F.sum("_v").over(local_w)
    ).localCheckpoint(eager=False)
    offs = _offsets(local, F.sum("_v"))
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, F.col("_lc") + F.col("_off"))
        .drop("_pid", "_v", "_lc", "_off")
    )

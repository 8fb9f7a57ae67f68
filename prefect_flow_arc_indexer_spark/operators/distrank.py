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

from prefect_flow_arc_indexer_spark.functions.caching import CheckpointRelease

# Floor for the range-partition fan-out (small SFs fit in a handful) and the
# target bytes each range partition should sort. When callers don't pass
# ``num_parts``, the fan-out is DERIVED from the input's optimizer size
# estimate (``derive_num_parts``) so a 100× scale-up that forgets the knob
# still gets a proportionally wider sort — the fixed-8 failure mode VERDICT
# r5 called out. ``spark.graft.distrank.parts`` (session conf) overrides.
MIN_PARTS = 8
TARGET_PART_BYTES = 64 * 1024 * 1024
PARTS_CONF = "spark.graft.distrank.parts"

# kept for callers/tests that want the explicit floor by name
DEFAULT_PARTS = MIN_PARTS

# Catalyst reports Long.MaxValue-ish sizeInBytes when statistics are unknown
# (spark.sql.defaultSizeInBytes); treat anything in that regime as "unknown".
_UNKNOWN_SIZE = 1 << 62


def derive_num_parts(df: DataFrame, target_bytes: int = TARGET_PART_BYTES) -> int:
    """Range-sort fan-out from the optimizer's size estimate: one partition
    per ``target_bytes`` of input, floored at :data:`MIN_PARTS`.

    No job runs — the estimate comes from the optimized logical plan's
    statistics (file-scan inputs report summed file size; local relations
    report rows × row width). When the estimate is unavailable or the
    unknown-stats sentinel, fall back to the cluster's default parallelism:
    wide enough to keep every core busy, never a single-task sort. The
    session conf ``spark.graft.distrank.parts`` short-circuits everything
    (the operational override for hand-tuned jobs)."""
    spark = df.sparkSession
    override = spark.conf.get(PARTS_CONF, None)
    if override:
        return max(1, int(override))
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        size = -1
    if size <= 0 or size >= _UNKNOWN_SIZE:
        return max(MIN_PARTS, spark.sparkContext.defaultParallelism)
    return int(max(MIN_PARTS, -(-size // target_bytes)))


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
    num_parts: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order)`` without a single-task sort:
    all input columns are preserved, ``out_col`` (1-based bigint) added.
    ``order`` must be a total order (unique last key). ``num_parts=None``
    derives the fan-out from the input size (:func:`derive_num_parts`)."""
    if num_parts is None:
        num_parts = derive_num_parts(df)
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
    out = (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, (F.col("_lr") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_lr", "_off")
    )
    # caller-release contract for the pinned partitioning (lazy checkpoint,
    # materialized by the consumer's first action — the ADVICE r10
    # naked-checkpoint class): DataFrame attributes don't survive further
    # transformations, so callers that derive new frames must capture
    # ``out.ckpt_release`` at call time and re-attach it to whatever they
    # return; harness sweeps also blanket-release between queries.
    out.ckpt_release = CheckpointRelease(local)
    return out


def global_cumsum(
    df: DataFrame,
    value: Column,
    order: list[Column],
    out_col: str = "cum",
    num_parts: int | None = None,
) -> DataFrame:
    """Inclusive running sum of ``value`` along the total order ``order``,
    two-pass. NULL values count as 0 (callers that must distinguish an
    all-NULL prefix — SQL window semantics yield NULL there — should filter
    NULLs first; every registered consumer discards NULL-valued rows via
    its own arithmetic, so the results are engine-identical).
    ``num_parts=None`` derives the fan-out from the input size
    (:func:`derive_num_parts`)."""
    if num_parts is None:
        num_parts = derive_num_parts(df)
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
    out = (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, F.col("_lc") + F.col("_off"))
        .drop("_pid", "_v", "_lc", "_off")
    )
    # same caller-release contract as global_rank
    out.ckpt_release = CheckpointRelease(local)
    return out

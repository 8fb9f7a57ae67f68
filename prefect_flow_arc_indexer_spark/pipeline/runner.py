"""Pipeline drivers reproducing the reference's three entry points (SURVEY
§3 E1/E2/E3; reference ``main_flow``, ``flows/main_flow.py:603-762``):

- :func:`full_sync` (E1): enumerate indexes -> order smallest-first -> per
  index: write a fresh generation -> validate -> atomically publish -> count
  reconcile; failed writes roll back their generation (X5).
- :func:`incremental_sync` (E2): per index, count changed rows since the
  inclusive watermark (skip-if-zero, T4), then merge upserts and tombstone
  deletes into the live generation (T3) and advance the watermark (T1).
- both accept ``or_ids`` (E3): a caller-pinned, lowercased index subset that
  bypasses enumeration and orphan cleanup (reference flows/main_flow.py:
  633-640,652).

Spark notes: the per-index loop is *driver-side control flow* (as in the
reference, where Prefect owns it); the data plane per index is one
declarative DataFrame job, so Catalyst still sees whole plans. The
incremental merge is the parquet-sink equivalent of ES upsert+delete-by-id:
``old ANTI JOIN batch ids  UNION  batch upserts`` — at production scale the
same logic is a Delta/Iceberg MERGE or the ES connector's upsert mode.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.pipeline.sinks import (
    VersionedSink,
    generation_timestamp,
)
from prefect_flow_arc_indexer_spark.streaming.watermark import WatermarkStore


@dataclass
class SyncReport:
    """Per-run observability (the reference logs these; X7 warn-only)."""

    indexes: list[str] = field(default_factory=list)
    written: dict[str, int] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)
    reconcile_ok: dict[str, bool] = field(default_factory=dict)
    rolled_back: list[str] = field(default_factory=list)
    dropped_orphans: list[str] = field(default_factory=list)


def _enumerate_indexes(docs: DataFrame) -> list[str]:
    """A1: distinct non-null index names."""
    return [
        r["index"]
        for r in docs.where(F.col("index").isNotNull())
        .select("index")
        .distinct()
        .collect()
    ]


def _order_by_size(docs: DataFrame, indexes: list[str]) -> list[str]:
    """A2+O1: smallest index first (fail fast, free memory early —
    reference flows/main_flow.py:153-169)."""
    rows = (
        docs.where(F.col("index").isin(indexes))
        .groupBy("index")
        .agg(F.count("id").alias("cnt"))
        .orderBy(F.col("cnt").asc(), F.col("index").asc())
        .collect()
    )
    return [r["index"] for r in rows]


def full_sync(
    spark: SparkSession,
    docs: DataFrame,
    sink: VersionedSink,
    or_ids: list[str] | None = None,
    now: datetime | None = None,
) -> SyncReport:
    """E1: full rebuild with write-audit-publish per index."""
    report = SyncReport()
    if or_ids:
        indexes = [x.lower() for x in or_ids]  # P8, flows/main_flow.py:640
    else:
        indexes = _enumerate_indexes(docs)
        # X8: orphan cleanup only runs on unpinned full syncs
        report.dropped_orphans = sink.cleanup_orphans(indexes)
    if not indexes:
        return report
    report.indexes = _order_by_size(docs, indexes)
    ts = generation_timestamp(now)

    for index in report.indexes:
        live = docs.where(
            (F.col("index") == index) & ~F.col("is_deleted")
        ).select("id", "document")
        gen = sink.generation_name(index, ts)
        try:
            sink.write_generation(live, index, ts)
            # X7: count reconciliation before the swap commits the alias
            expected = live.count()
            actual = spark.read.parquet(sink.generation_path(gen)).count()
            report.reconcile_ok[index] = expected == actual
            sink.publish(index, gen)
            report.written[index] = actual
        except Exception:
            # X5: roll back the half-written generation, keep the old alias
            sink.drop_generation(gen)
            report.rolled_back.append(index)
            raise
    return report


def incremental_sync(
    spark: SparkSession,
    docs: DataFrame,
    sink: VersionedSink,
    watermarks: WatermarkStore,
    pipeline_name: str = "default",
    or_ids: list[str] | None = None,
    now: datetime | None = None,
) -> SyncReport:
    """E2: CDC merge since the inclusive watermark, tombstones propagated."""
    report = SyncReport()
    wm = watermarks.get(pipeline_name)
    if wm is None:
        raise ValueError(
            "no watermark recorded; run full_sync first or seed the store"
        )
    run_started = now or datetime.now()
    indexes = (
        [x.lower() for x in or_ids] if or_ids else _enumerate_indexes(docs)
    )
    report.indexes = indexes

    changed = docs.where(F.col("updated_at") >= F.lit(wm))  # T2: inclusive
    for index in indexes:
        batch = changed.where(F.col("index") == index)
        # T4/A4: skip-if-zero gate before any write work
        n = batch.count()
        if n == 0:
            report.skipped.append(index)
            continue
        if not sink.alias_exists(index):
            # T7-adjacent: index missing downstream -> full rebuild path
            live = docs.where(
                (F.col("index") == index) & ~F.col("is_deleted")
            ).select("id", "document")
            gen = sink.write_generation(live, index, generation_timestamp(run_started))
            sink.publish(index, gen)
            report.written[index] = n
            continue
        old = sink.read_alias(spark, index)
        upserts = batch.where(~F.col("is_deleted")).select("id", "document")
        touched_ids = batch.select("id")
        # idempotent by id: delete-then-insert covers upsert AND tombstone
        merged = old.join(touched_ids, "id", "left_anti").unionByName(upserts)
        gen = sink.write_generation(
            merged, index, generation_timestamp(run_started)
        )
        sink.publish(index, gen)
        report.written[index] = n

    # T1: the *run start* becomes the next watermark (rows updated while the
    # run was in flight re-deliver next time; safe by idempotence)
    watermarks.set(pipeline_name, run_started)
    return report

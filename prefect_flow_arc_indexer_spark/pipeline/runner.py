"""Pipeline drivers reproducing the reference's three entry points (SURVEY
§3 E1/E2/E3; reference ``main_flow``, ``flows/main_flow.py:603-762``):

- :func:`full_sync` (E1): enumerate indexes -> order smallest-first -> per
  index: write a fresh generation -> validate -> atomically publish -> count
  reconcile; failed writes roll back their generation (X5).
- :func:`incremental_sync` (E2): per index, count changed rows since the
  inclusive watermark (skip-if-zero, T4), then merge upserts and tombstone
  deletes into the live generation (T3) and advance the watermark (T1).
  When the sink's stored ``schema_name`` diverges from the source's current
  value, the index is force-rebuilt instead of merged (T7, reference
  ``flows/main_flow.py:62-86,674-693``).
- both accept ``or_ids`` (E3): a caller-pinned, lowercased index subset that
  bypasses enumeration and orphan cleanup (reference flows/main_flow.py:
  633-640,652).

Resilience / scheduling semantics carried over from the reference:

- X4 flow-level retries (reference ``flows/main_flow.py:722-723``: 5 retries
  x 500 s on the stream task): both drivers accept ``(retries,
  retry_delay_s)``; a failed index rolls back its half-written generation,
  sleeps, and retries — only after exhaustion does the run abort.
- X3 concurrency classes (reference ``flows/main_flow.py:685-687,721``): the
  two largest indexes carry the ``pg-indexer-large`` tag; :func:`full_sync`
  maps the tag onto ``spark.scheduler.pool`` via a task-local property so a
  fair-scheduler config can cap / isolate the heavyweight jobs exactly as
  the reference's Prefect concurrency limit does.

Spark notes: the per-index loop is *driver-side control flow* (as in the
reference, where Prefect owns it); the data plane per index is one
declarative DataFrame job, so Catalyst still sees whole plans. The
incremental merge is the parquet-sink equivalent of ES upsert+delete-by-id:
``old ANTI JOIN batch ids  UNION  batch upserts`` — at production scale the
same logic is a Delta/Iceberg MERGE or the ES connector's upsert mode.
"""

from __future__ import annotations

import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.pipeline.sinks import (
    VersionedSink,
    generation_timestamp,
)
from prefect_flow_arc_indexer_spark.streaming.watermark import WatermarkStore

# Reference concurrency tags (flows/main_flow.py:685-687,721); the top-2
# largest indexes run under the -large class (same rule as q_topk_tail).
POOL_DEFAULT = "pg-indexer"
POOL_LARGE = "pg-indexer-large"
N_LARGE = 2

# Reference JSONB probe path (flows/main_flow.py:69:
# ``document->'schema_maintainer'->>'schema_name'``).
SCHEMA_PATH = "$.schema_maintainer.schema_name"


@dataclass
class SyncReport:
    """Per-run observability (the reference logs these; X7 warn-only)."""

    indexes: list[str] = field(default_factory=list)
    written: dict[str, int] = field(default_factory=dict)
    skipped: list[str] = field(default_factory=list)
    reconcile_ok: dict[str, bool] = field(default_factory=dict)
    rolled_back: list[str] = field(default_factory=list)
    dropped_orphans: list[str] = field(default_factory=list)
    rebuilt: list[str] = field(default_factory=list)  # T7 forced rebuilds
    retried: dict[str, int] = field(default_factory=dict)  # X4 retries used
    pools: dict[str, str] = field(default_factory=dict)  # X3 pool per index
    # X7 applied to the ES mirror: alias count == ES _count after the
    # mirror writes (warn-only, like the reference's reconcile)
    mirror_reconcile: dict[str, bool] = field(default_factory=dict)
    # X6 applied to the ES mirror on full sync: the physical index the
    # alias was atomically swapped to (None = swap attempted and failed;
    # warn-only posture, reference swap_indexes flows/main_flow.py:534-555)
    mirror_published: dict[str, str | None] = field(default_factory=dict)


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


def _run_with_retries(
    index: str,
    attempt,
    rollback,
    report: SyncReport,
    retries: int,
    retry_delay_s: float,
    sleep,
) -> None:
    """X4: run ``attempt()`` up to ``1 + retries`` times; every failure
    rolls back via ``rollback()`` (X5) so a retry starts from a clean sink;
    the last failure re-raises after a final rollback."""
    for n in range(retries + 1):
        try:
            attempt()
            if n:
                report.retried[index] = n
            return
        except Exception:
            rollback()
            if n == retries:
                report.rolled_back.append(index)
                raise
            sleep(retry_delay_s)


def _collision_free_ts(
    sink: VersionedSink, index: str, ts: str, run_started: datetime
) -> str:
    """Same-second generation-name collision guard (the hazard ``compact``
    and ``stream_incremental_sink`` already dodge): if this run's timestamp
    reproduces the PUBLISHED generation name of ``index`` — publish followed
    by an incremental run within one second — ``write_generation``'s
    overwrite would clobber the directory the lazy merge plan is reading
    from, and a retry rollback would delete live published data. Bump the
    timestamp forward one second until the name is free (ADVICE r4)."""
    published = sink.read_manifest().get(index)
    bump = 0
    while sink.generation_name(index, ts) == published:
        bump += 1
        ts = generation_timestamp(
            datetime.fromtimestamp(run_started.timestamp() + bump)
        )
    return ts


def _probe_schema_name(frame: DataFrame, path: str):
    """T7 probe: the ``schema_name`` of one (deterministically-arbitrary:
    min-id) document — the reference grabs an arbitrary doc from each side
    (flows/main_flow.py:37-59) and compares the JSONB path value."""
    row = frame.agg(
        F.min_by(F.get_json_object(F.col("document"), path), F.col("id"))
        .alias("schema_name")
    ).first()
    return row["schema_name"] if row else None


def _unescape_partition_value(s: str) -> str:
    """Decode Spark's partition-dir escaping (ExternalCatalogUtils.
    escapePathName: unsafe chars written as %XX, uppercase hex). Only %XX
    triples are decoded; a bare '%' that isn't a valid escape is kept
    literal, matching Spark's own unescapePathName."""
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%" and i + 3 <= len(s):
            try:
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


def one_pass_live(docs: DataFrame, indexes: list[str]) -> DataFrame:
    """The fused full-sync data plane: ONE frame holding every index's live
    documents, pre-shuffled on ``index`` so the ``partitionBy`` write emits
    one directory per index from few tasks (the
    ``pipeline.partitioned.write_partitioned`` discipline). A full sync
    through this frame scans the fact table ONCE, not O(#indexes) times —
    the Spark-native improvement over the reference's one-SQL-per-index
    shape (flows/main_flow.py:317-343)."""
    return (
        docs.where(F.col("index").isin(indexes) & ~F.col("is_deleted"))
        .select("index", "id", "document")
        .repartition(F.col("index"))
    )


def _full_sync_one_pass(
    spark: SparkSession,
    docs: DataFrame,
    sink: VersionedSink,
    report: SyncReport,
    ts: str,
    retries: int,
    retry_delay_s: float,
    sleep,
    bucketed: bool = False,
    n_buckets: int = 16,
) -> None:
    """One Spark job writes every index's generation data (partitionBy on
    ``index`` into a staging dir, single fact-table scan); the per-index
    write-audit-publish loop stays driver-side: each staged partition
    directory is renamed into place as its generation, reconciled against
    per-index expected counts collected by an ``Observation`` ON the write
    job itself (one conditional count per index — #indexes is
    catalog-bounded — so reconciliation costs ZERO extra scans), and
    atomically published. Rollback moves a generation back to staging so a
    retry can re-promote it."""
    from pyspark.sql import Observation

    from prefect_flow_arc_indexer_spark.pipeline.bucketed import (
        _write_marker,
        bucket_of,
        write_generation_bucketed,
    )

    live_all = one_pass_live(docs, report.indexes)
    stage = os.path.join(sink.base_dir, f"_stage_{ts}")
    os.makedirs(sink.base_dir, exist_ok=True)
    obs = Observation(f"one_pass_counts_{ts}")
    observed = live_all.observe(
        obs,
        *(
            F.sum(F.when(F.col("index") == idx, 1).otherwise(0))
            .cast("long")
            .alias(f"c_{n}")
            for n, idx in enumerate(report.indexes)
        ),
    )
    part_cols = ["index"]
    if bucketed:
        # composes: the same single scan also lays down the hash-bucketed
        # generation layout the incremental merge path prunes on
        observed = observed.withColumn(
            "bucket", bucket_of(F.col("id"), n_buckets)
        ).repartition(F.col("index"), F.col("bucket"))
        part_cols = ["index", "bucket"]
    observed.write.partitionBy(*part_cols).mode("overwrite").parquet(stage)
    counts = obs.get  # blocks until the write job finishes
    expected = {
        idx: counts[f"c_{n}"] or 0 for n, idx in enumerate(report.indexes)
    }
    # Resolve each index's staged dir by DECODING Spark's partition-value
    # escaping (escapePathName writes %XX for chars that are unsafe in a
    # path, e.g. 'a:b' stages as 'index=a%3Ab'): building 'index={value}'
    # by hand would miss every escaped name and the guard below would abort
    # a perfectly good sync. Unknown dirs are left unmapped and the audit
    # abort still protects against a genuinely missing stage.
    staged_dirs: dict[str, str] = {}
    for entry in os.listdir(stage) if os.path.isdir(stage) else []:
        if entry.startswith("index="):
            staged_dirs[_unescape_partition_value(entry[len("index="):])] = (
                os.path.join(stage, entry)
            )
    try:
        for index in report.indexes:
            part_dir = staged_dirs.get(
                index, os.path.join(stage, f"index={index}")
            )
            gen = sink.generation_name(index, ts)
            gen_path = sink.generation_path(gen)

            def attempt(index=index, part_dir=part_dir, gen=gen,
                        gen_path=gen_path):
                want = expected.get(index, 0)
                if os.path.isdir(part_dir) and not os.path.isdir(gen_path):
                    shutil.move(part_dir, gen_path)
                    if bucketed:
                        _write_marker(gen_path, n_buckets)
                if os.path.isdir(gen_path):
                    actual = spark.read.parquet(gen_path).count()
                elif want > 0:
                    # the write job counted live docs for this index but its
                    # staged partition dir is absent (partition-value
                    # escaping of an unusual index name, prior partial
                    # failure): publishing would commit an EMPTY generation
                    # over live data — abort so _run_with_retries rolls back,
                    # mirroring compact()'s audit-abort discipline
                    raise RuntimeError(
                        f"one-pass stage for {index!r} missing: expected "
                        f"{want} docs but no staged partition at {part_dir}"
                    )
                else:
                    # an index whose docs are all tombstones writes no
                    # partition — publish an explicitly empty generation,
                    # in the bucketed layout when requested so the index
                    # keeps its O(touched-buckets) merge cost class
                    empty = docs.where(F.lit(False)).select("id", "document")
                    if bucketed:
                        write_generation_bucketed(
                            sink, empty, index, ts, n_buckets
                        )
                    else:
                        sink.write_generation(empty, index, ts)
                    actual = 0
                if actual != want:
                    # short generation (lost files, concurrent truncation):
                    # abort-before-publish, same contract as compact()
                    raise RuntimeError(
                        f"one-pass audit for {index!r} failed: expected "
                        f"{want} docs, staged generation has {actual}"
                    )
                report.reconcile_ok[index] = True
                sink.publish(index, gen)
                report.written[index] = actual

            def rollback(part_dir=part_dir, gen_path=gen_path):
                # restore the staged partition so a retry can re-promote it
                if os.path.isdir(gen_path) and not os.path.isdir(part_dir):
                    shutil.move(gen_path, part_dir)
                else:
                    shutil.rmtree(gen_path, ignore_errors=True)

            _run_with_retries(
                index, attempt, rollback, report, retries, retry_delay_s,
                sleep,
            )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def full_sync(
    spark: SparkSession,
    docs: DataFrame,
    sink: VersionedSink,
    or_ids: list[str] | None = None,
    now: datetime | None = None,
    retries: int = 0,
    retry_delay_s: float = 0.0,
    sleep=time.sleep,
    parallel_large: bool = False,
    one_pass: bool = False,
    bucketed: bool = False,
    n_buckets: int = 16,
) -> SyncReport:
    """E1: full rebuild with write-audit-publish per index.
    ``bucketed=True`` lays generations out hash-bucketed by id
    (``pipeline.bucketed``) so later incremental merges rewrite only
    touched buckets.

    ``parallel_large=True`` finishes X3 end-to-end (reference
    ``run_large_indexer_parallel``, flows/main_flow.py:685-687,721): the
    small indexes still run smallest-first sequentially, then the
    ``pg-indexer-large`` class is submitted CONCURRENTLY from a driver
    thread pool — each thread sets its own thread-local scheduler pool, so
    a FAIR scheduler config actually sees both pools at once.

    ``one_pass=True`` fuses the data plane: one ``partitionBy("index")``
    write job (single fact-table scan) feeds every generation; publish/
    reconcile remain per-index and driver-side. Implies the data plane is
    already one parallel job, so ``parallel_large`` is moot there.
    """
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
    # X3: _order_by_size is ascending, so the top-N_LARGE are the tail
    large = set(report.indexes[-N_LARGE:])
    ts = generation_timestamp(now)
    sc = spark.sparkContext
    for index in report.indexes:
        report.pools[index] = POOL_LARGE if index in large else POOL_DEFAULT

    if one_pass:
        _full_sync_one_pass(
            spark, docs, sink, report, ts, retries, retry_delay_s, sleep,
            bucketed=bucketed, n_buckets=n_buckets,
        )
        return report

    def _sync_one(index: str) -> None:
        # setLocalProperty is thread-local (pinned-thread mode), so each
        # concurrent driver thread carries its own pool tag
        sc.setLocalProperty("spark.scheduler.pool", report.pools[index])
        try:
            live = docs.where(
                (F.col("index") == index) & ~F.col("is_deleted")
            ).select("id", "document")
            gen = sink.generation_name(index, ts)

            def attempt(index=index, live=live, gen=gen):
                if bucketed:
                    from prefect_flow_arc_indexer_spark.pipeline.bucketed import (  # noqa: E501
                        write_generation_bucketed,
                    )

                    write_generation_bucketed(
                        sink, live, index, ts, n_buckets
                    )
                else:
                    sink.write_generation(live, index, ts)
                # X7: count reconciliation before the swap commits the alias
                expected = live.count()
                actual = spark.read.parquet(sink.generation_path(gen)).count()
                report.reconcile_ok[index] = expected == actual
                sink.publish(index, gen)
                report.written[index] = actual

            _run_with_retries(
                index,
                attempt,
                lambda gen=gen: sink.drop_generation(gen),
                report,
                retries,
                retry_delay_s,
                sleep,
            )
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    small = [i for i in report.indexes if i not in large]
    big = [i for i in report.indexes if i in large]
    if parallel_large and len(big) > 1:
        for index in small:
            _sync_one(index)
        with ThreadPoolExecutor(
            max_workers=len(big), thread_name_prefix="pg-indexer-large"
        ) as pool:
            futures = [pool.submit(_sync_one, i) for i in big]
            errs = [f.exception() for f in futures]
        for e in errs:
            if e is not None:
                raise e
    else:
        for index in report.indexes:
            _sync_one(index)
    return report


def incremental_sync(
    spark: SparkSession,
    docs: DataFrame,
    sink: VersionedSink,
    watermarks: WatermarkStore,
    pipeline_name: str = "default",
    or_ids: list[str] | None = None,
    now: datetime | None = None,
    schema_path: str = SCHEMA_PATH,
    retries: int = 0,
    retry_delay_s: float = 0.0,
    sleep=time.sleep,
    bucketed: bool = False,
    n_buckets: int = 16,
) -> SyncReport:
    """E2: CDC merge since the inclusive watermark, tombstones propagated;
    schema drift forces a full per-index rebuild (T7).

    When the published generation is hash-bucketed (or ``bucketed=True``
    makes rebuilds write that layout), the merge goes through
    ``pipeline.bucketed.merge_bucketed``: only buckets containing touched
    ids are rewritten, untouched buckets are hard-linked into the new
    generation — O(touched) I/O per batch instead of O(corpus)."""
    from prefect_flow_arc_indexer_spark.pipeline.bucketed import (
        bucket_count,
        merge_bucketed,
        write_generation_bucketed,
    )
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
    ts = generation_timestamp(run_started)
    for index in indexes:
        batch = changed.where(F.col("index") == index)
        # T4/A4: skip-if-zero gate before any write work
        n = batch.count()
        if n == 0:
            report.skipped.append(index)
            continue
        live = docs.where(
            (F.col("index") == index) & ~F.col("is_deleted")
        ).select("id", "document")

        rebuild = not sink.alias_exists(index)
        old = None
        if not rebuild:
            old = sink.read_alias(spark, index)
            # T7: schema_name drift in the sink forces a full rebuild
            # (reference flows/main_flow.py:62-86,674-693) — compare one
            # arbitrary doc's JSONB path value on each side.
            sink_name = _probe_schema_name(old, schema_path)
            src_name = _probe_schema_name(live, schema_path)
            if sink_name != src_name:
                rebuild = True
                report.rebuilt.append(index)

        # same-second collision with the published generation would clobber
        # the directory the lazy plan reads from (and rollback would delete
        # live data) — bump this index's timestamp until the name is free
        idx_ts = _collision_free_ts(sink, index, ts, run_started)

        if rebuild:
            gen = sink.generation_name(index, idx_ts)
            actual = [0]

            def attempt(index=index, live=live, gen=gen, idx_ts=idx_ts,
                        actual=actual):
                if bucketed:
                    write_generation_bucketed(
                        sink, live, index, idx_ts, n_buckets
                    )
                else:
                    sink.write_generation(live, index, idx_ts)
                # record what the rebuild actually wrote (the full live doc
                # set), not the CDC batch count — consistent with full_sync
                actual[0] = spark.read.parquet(
                    sink.generation_path(gen)
                ).count()
                sink.publish(index, gen)

            _run_with_retries(
                index,
                attempt,
                lambda gen=gen: sink.drop_generation(gen),
                report,
                retries,
                retry_delay_s,
                sleep,
            )
            report.written[index] = actual[0]
            continue

        gen = sink.generation_name(index, idx_ts)
        if bucket_count(sink, sink.read_manifest()[index]) is not None:
            # bucketed merge: rewrite only buckets containing touched ids
            def attempt(index=index, batch=batch, gen=gen, idx_ts=idx_ts):
                merge_bucketed(
                    spark,
                    sink,
                    index,
                    batch.select("id", "document", "is_deleted"),
                    idx_ts,
                )
                sink.publish(index, gen)
        else:
            upserts = batch.where(~F.col("is_deleted")).select(
                "id", "document"
            )
            touched_ids = batch.select("id")
            # idempotent by id: delete-then-insert covers upsert + tombstone
            merged = old.join(touched_ids, "id", "left_anti").unionByName(
                upserts
            )

            def attempt(index=index, merged=merged, gen=gen, idx_ts=idx_ts):
                sink.write_generation(merged, index, idx_ts)
                sink.publish(index, gen)

        _run_with_retries(
            index,
            attempt,
            lambda gen=gen: sink.drop_generation(gen),
            report,
            retries,
            retry_delay_s,
            sleep,
        )
        report.written[index] = n

    # T1: the *run start* becomes the next watermark (rows updated while the
    # run was in flight re-deliver next time; safe by idempotence)
    watermarks.set(pipeline_name, run_started)
    return report

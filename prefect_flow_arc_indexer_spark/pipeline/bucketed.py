"""Hash-bucketed generations: O(touched-buckets) incremental merges.

The plain :class:`~prefect_flow_arc_indexer_spark.pipeline.sinks.
VersionedSink` merge rewrites an index's ENTIRE live generation per batch
(anti-join + union + full rewrite) — O(corpus) I/O per micro-batch, which
dies at 100 TB. Bucketed generations fix the I/O class:

- a generation is laid out ``bucket=<pmod(xxhash64(id), N)>/part-*.parquet``
  (Hive-style dirs — the file-lake form of ``bucketBy``), with the bucket
  count recorded in a ``_buckets.json`` marker;
- a merge computes the batch's TOUCHED buckets (distinct id-hash buckets,
  catalog-bounded collect), rewrites only those (the read is
  partition-pruned to the touched dirs), and HARD-LINKS every untouched
  bucket's files into the new generation — metadata-only, zero data I/O,
  the local-FS analog of Iceberg/Delta rewriting only affected data files
  while re-listing the rest in the new snapshot;
- the write-audit-publish contract is unchanged: the new generation is
  complete (links + rewrites) before the atomic manifest flip, so readers
  never see a partial merge and rollback is still drop-the-new-generation
  (links mean dropping never harms the published generation's files).

Bucket-pruned point lookups come free: ``WHERE bucket = pmod(xxhash64(id),
N)`` prunes to one directory. ``compact_bucketed`` preserves the layout
(compaction happens per bucket), so merge cost stays O(touched) forever.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.pipeline.sinks import (
    VersionedSink,
    generation_timestamp,
)

N_BUCKETS_DEFAULT = 16
_MARKER = "_buckets.json"


def bucket_of(id_col: Column, n_buckets: int) -> Column:
    """Stable id -> bucket (xxhash64 is fixed-seed and engine-stable)."""
    return F.pmod(F.xxhash64(id_col), F.lit(n_buckets)).cast("int")


def bucket_count(sink: VersionedSink, generation: str) -> int | None:
    """The generation's bucket count, or None when it is unbucketed."""
    try:
        with open(
            os.path.join(sink.generation_path(generation), _MARKER)
        ) as f:
            return int(json.load(f)["n_buckets"])
    except (FileNotFoundError, NotADirectoryError):
        return None


def _write_marker(path: str, n_buckets: int) -> None:
    with open(os.path.join(path, _MARKER), "w") as f:
        json.dump({"n_buckets": n_buckets}, f)


def write_generation_bucketed(
    sink: VersionedSink,
    df: DataFrame,
    alias: str,
    timestamp: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> str:
    """Write a generation bucketed by id hash. ``repartition(bucket)``
    first so each bucket directory is written by few tasks (file count
    ~ |buckets|, not |buckets| x |tasks|)."""
    gen = sink.generation_name(alias, timestamp)
    path = sink.generation_path(gen)
    (
        df.withColumn("bucket", bucket_of(F.col("id"), n_buckets))
        .repartition(F.col("bucket"))
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(path)
    )
    # an EMPTY frame writes no bucket=N dirs at all, leaving a generation
    # Spark cannot re-read (UNABLE_TO_INFER_SCHEMA) — which would break
    # read_alias/merge/compact for an all-tombstone index. Lay down one
    # schema-carrying empty bucket so the layout (and its O(touched-bucket)
    # merge cost class) survives.
    if not any(e.startswith("bucket=") for e in os.listdir(path)):
        df.limit(0).write.mode("overwrite").parquet(
            os.path.join(path, "bucket=0")
        )
    _write_marker(path, n_buckets)
    return gen


def _link_bucket(src: str, dst: str) -> None:
    """Hard-link a bucket directory's data files (fallback: copy)."""
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        if not name.endswith(".parquet"):
            continue
        try:
            os.link(os.path.join(src, name), os.path.join(dst, name))
        except OSError:
            shutil.copy2(os.path.join(src, name), os.path.join(dst, name))


def merge_bucketed(
    spark: SparkSession,
    sink: VersionedSink,
    index: str,
    batch: DataFrame,
    timestamp: str,
) -> str:
    """Merge a CDC batch (``id, document, is_deleted``, already
    last-writer-wins-compacted per id) into the published bucketed
    generation of ``index``: rewrite ONLY the buckets containing touched
    ids, hard-link the rest, return the (unpublished) new generation.
    Idempotent by id — replaying the same batch produces an identical
    generation."""
    old_gen = sink.read_manifest()[index]
    n = bucket_count(sink, old_gen)
    if n is None:
        raise ValueError(f"generation {old_gen!r} is not bucketed")
    old_path = sink.generation_path(old_gen)
    gen = sink.generation_name(index, timestamp)
    new_path = sink.generation_path(gen)

    touched = sorted(
        r["b"]
        for r in batch.select(bucket_of(F.col("id"), n).alias("b"))
        .distinct()
        .collect()
    )
    os.makedirs(new_path, exist_ok=True)
    for name in os.listdir(old_path):
        if not name.startswith("bucket="):
            continue
        b = int(name.split("=", 1)[1])
        if b not in touched:
            _link_bucket(
                os.path.join(old_path, name), os.path.join(new_path, name)
            )
    if touched:
        # partition-pruned: only the touched bucket dirs are scanned
        old = spark.read.parquet(old_path).where(
            F.col("bucket").isin([int(b) for b in touched])
        )
        upserts = (
            batch.where(~F.col("is_deleted"))
            .select("id", "document")
            .withColumn("bucket", bucket_of(F.col("id"), n))
        )
        merged = old.join(
            batch.select("id"), "id", "left_anti"
        ).unionByName(upserts)
        (
            merged.repartition(F.col("bucket"))
            .write.partitionBy("bucket")
            .mode("append")  # into the linked skeleton; only touched dirs
            .parquet(new_path)
        )
    _write_marker(new_path, n)
    return gen


def compact_bucketed(
    spark: SparkSession,
    sink: VersionedSink,
    alias: str,
    target_bytes: int = 128 * 1024 * 1024,
    now: datetime | None = None,
) -> str:
    """Small-file compaction that PRESERVES the bucket layout (each bucket
    compacts to one file — bucket count is chosen at table design so a
    bucket fits ``target_bytes``; ``q_small_files``-style monitoring says
    when to re-bucket), so post-compaction merges stay O(touched buckets).
    Same write-audit-publish discipline as ``VersionedSink.compact``."""
    old_gen = sink.read_manifest()[alias]
    n = bucket_count(sink, old_gen)
    if n is None:
        raise ValueError(f"generation {old_gen!r} is not bucketed")
    old_path = sink.generation_path(old_gen)
    df = spark.read.parquet(old_path)
    expected = df.count()
    ts = generation_timestamp(now)
    if sink.generation_name(alias, ts) == old_gen:
        ts = generation_timestamp(
            datetime.fromtimestamp((now or datetime.now()).timestamp() + 1)
        )
    gen = sink.generation_name(alias, ts)
    new_path = sink.generation_path(gen)
    (
        df.repartition(F.col("bucket"))
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(new_path)
    )
    _write_marker(new_path, n)
    actual = spark.read.parquet(new_path).count()
    if actual != expected:
        sink.drop_generation(gen)
        raise RuntimeError(
            f"bucketed compaction row mismatch for {alias}: "
            f"{actual} != {expected}"
        )
    sink.publish(alias, gen)
    return gen

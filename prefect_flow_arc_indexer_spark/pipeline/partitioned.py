"""Hive-style partitioned parquet layout: date-partitioned writes, dynamic
partition overwrite, and partition-pruned reads.

The reference's incremental path filters `updated_at >= watermark` against
an unpartitioned Postgres table and lets the B-tree index save it
(`/root/reference/flows/main_flow.py:317-323`); a 100 TB lake table gets
the same effect from directory layout: partition by event date, and a
watermark predicate prunes whole partitions BEFORE any file is opened —
`.explain` shows the scan's ``PartitionFilters`` and the file count drops
to the touched dates only.

Two write disciplines encoded here:

- `write_partitioned`: initial/full load, ``partitionBy(date)``. The frame
  is repartitioned on the partition column first so each task writes few
  partitions (the default write pattern scatters every task across every
  date → tiny-file explosion — the classic 100 TB mistake).
- `overwrite_partitions`: incremental load with
  ``partitionOverwriteMode=dynamic`` — only the partitions present in the
  batch are replaced; untouched history is never rewritten. This is the
  file-lake analog of the reference's per-index generation swap: the
  overwrite is atomic per partition directory.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F

PARTITION_COL = "event_date"


def with_event_date(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the partition column (a DATE) from the event-time column."""
    return df.withColumn(PARTITION_COL, F.to_date(F.col(ts_col)))


def write_partitioned(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Full-load write, one directory per ``event_date``.

    ``repartition(PARTITION_COL)`` first: every output partition is written
    by as few tasks as possible, so file count ≈ |dates|, not
    |dates| × |tasks|."""
    (
        df.repartition(F.col(PARTITION_COL))
        .write.partitionBy(PARTITION_COL)
        .mode(mode)
        .parquet(path)
    )


@contextmanager
def _dynamic_overwrite(spark: SparkSession):
    key = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, prior)


def overwrite_partitions(
    spark: SparkSession, batch: DataFrame, path: str
) -> None:
    """Incremental write: replace ONLY the partitions the batch touches
    (dynamic partition overwrite); all other date directories are untouched
    — re-running a day is idempotent, history never rewritten."""
    with _dynamic_overwrite(spark):
        (
            batch.repartition(F.col(PARTITION_COL))
            .write.partitionBy(PARTITION_COL)
            .mode("overwrite")
            .parquet(path)
        )


def read_since(spark: SparkSession, path: str, since_date) -> DataFrame:
    """Watermark read over the partitioned table; the date predicate lands
    in the scan's PartitionFilters (directory pruning, zero data files
    opened for older dates)."""
    return spark.read.parquet(path).where(F.col(PARTITION_COL) >= F.lit(since_date))

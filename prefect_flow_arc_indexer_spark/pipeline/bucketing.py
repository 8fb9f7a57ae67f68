"""Bucketed-table layout — the co-located-join path for repeated big joins.

The reference re-reads its Postgres table per run and never joins two large
relations, so bucketing has no analog there; at 100 TB it is the standard
Spark answer to "this fact table joins on the same key every day": pay the
shuffle ONCE at write time (``bucketBy`` hash-partitions rows into a fixed
bucket count, ``sortBy`` pre-sorts within each bucket), and every subsequent
equi-join or aggregation on the bucket key runs with NO exchange — the
SortMergeJoin reads both sides' matching buckets directly.

Design notes for scale:

- bucket count is a layout contract: both join sides must agree (Spark can
  coalesce mismatched counts when one divides the other, but same-count is
  the fast path). 2-4x total executor cores is the usual sizing so one
  bucket ~= one task.
- bucket pruning: an equality predicate on the bucket key reads 1/N of the
  files — the same effect partition pruning gives for date columns, but for
  high-cardinality keys where directory-per-value would melt the metastore.
- bucketed tables live in the session catalog (``saveAsTable``): plain
  ``.parquet(path)`` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet-backed bucketed (and optionally
    sorted-within-bucket) catalog table, overwriting any previous layout."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two same-bucketed catalog tables on their bucket key.

    With matching layouts this plans as a SortMergeJoin with ZERO
    ShuffleExchange operators (tests assert this) — the join cost is a
    co-located merge, which is what makes the write-time shuffle pay for
    itself after the second join.
    """
    return spark.table(left_table).join(spark.table(right_table), key)

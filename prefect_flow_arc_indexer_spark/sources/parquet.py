"""Parquet table loaders for the test star schema, plus the logical
``index_documents`` view that stands in for the reference's Postgres source
table (``graph.index_documents``, reference ``flows/main_flow.py:607``).

The stand-in mapping (documented in repo FIXTURES.md §C) is::

    index      <- events.event_type        (low-cardinality routing key)
    id         <- CAST(events.event_id AS STRING)
    document   <- events.props             (JSON string payload)
    is_deleted <- events.event_id % 13 = 0 (deterministic tombstone mix;
                  events.value is never negative and props has no 'deleted'
                  key, so FIXTURES' two candidate derivations would both be
                  constant-false — this one exercises both branches)
    updated_at <- events.ts                (CDC watermark column)

Everything here is expressed so Catalyst can push projection + predicates to
the parquet scan; the view is a select, never a materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan_out: bool = False
) -> DataFrame:
    """Load one star-schema table; normalizes events' nano timestamps.

    events.parquet stores TIMESTAMP(NANOS); Spark reads it as long (via the
    nanosAsLong conf applied in session.prepare_session) and we convert to a
    microsecond TimestampType — the same truncation DuckDB applies, keeping
    the oracle comparison exact.

    ``fan_out=True`` is for operators whose per-row work dominates the scan
    (shingling, hashing, vector math): when the scan yields fewer partitions
    than the cluster has cores (the test files are single-row-group, so they
    read as ONE task), redistribute rows first. The guard makes it a no-op
    at production scale, where a 100 TB scan already has ~1e5 partitions —
    no gratuitous shuffle lands in the big-data path.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: nano values (~1.7e18) exceed double's exact-int
        # range, so `ts / 1000` would drift by ±1us
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and dict(df.dtypes).get("ts") == "timestamp_ntz":
        # events staged by another writer (DuckDB, plain Spark) carry
        # micro timestamps with isAdjustedToUTC=false, which Spark 4 reads
        # as TIMESTAMP_NTZ; downstream event-time ops (window(),
        # session_window(), unix_micros()) require the instant type
        df = df.withColumn("ts", F.to_timestamp("ts"))
    if fan_out:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    return df


def table_row_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Row count of one table from parquet FOOTER metadata — the cheap
    input to plan-selection gates (f91d8c8 pattern), where a Spark count
    job would cost more than the plan difference it arbitrates. Uses
    pyarrow on the driver for local paths (zero jobs); falls back to a
    metadata-only Spark count for filesystems pyarrow can't reach (at
    production scale the table catalog answers this instead)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return spark.read.parquet(path).count()


def index_documents(
    spark: SparkSession, sf_dir: str, fan_out: bool = False
) -> DataFrame:
    """The reference's source table as a logical view over ``events``.

    Mirrors the 5-column schema implied by reference ``flows/main_flow.py``
    (index text / id text / document jsonb / is_deleted bool / updated_at
    timestamptz — see SURVEY §1.1). ``fan_out`` as in :func:`load_table` —
    pass it from consumers whose per-row work (JSON/VARIANT parsing)
    dominates the scan; the events file reads as 1-4 partitions at test
    SFs, which would serialize that CPU.
    """
    ev = load_table(spark, sf_dir, "events", fan_out=fan_out)
    return ev.select(
        F.col("event_type").alias("index"),
        F.col("event_id").cast("string").alias("id"),
        F.col("props").alias("document"),
        ((F.col("event_id") % 13) == 0).alias("is_deleted"),
        F.col("ts").alias("updated_at"),
    )


# DuckDB CTE encoding the identical view for oracle SQL; every oracle that
# touches the reference surface starts with `WITH {IDX_DOCS_CTE} ...`.
IDX_DOCS_CTE = """index_documents AS (
  SELECT event_type AS "index",
         CAST(event_id AS VARCHAR) AS id,
         props AS document,
         (event_id % 13 = 0) AS is_deleted,
         ts AS updated_at
    FROM events
)"""

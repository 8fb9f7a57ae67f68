"""Partitioned-layout pipeline: pruning reaches the scan, dynamic overwrite
replaces only touched dates, and the layout round-trips values exactly."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.pipeline import partitioned as pp
from prefect_flow_arc_indexer_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


def _events(spark):
    return pp.with_event_date(load_table(spark, SF_DIR, "events"))


def test_write_and_partition_pruned_read(spark, tmp_path):
    path = str(tmp_path / "events_by_date")
    ev = _events(spark)
    pp.write_partitioned(ev, path)
    # layout: one directory per date
    dates = sorted(
        d for d in os.listdir(path) if d.startswith("event_date=")
    )
    n_dates = ev.select("event_date").distinct().count()
    assert len(dates) == n_dates

    since = datetime.date(2024, 1, 20)
    got = pp.read_since(spark, path, since)
    want = ev.where(F.col("event_date") >= F.lit(since))
    assert got.count() == want.count()

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_date" in plan.split(
        "PartitionFilters"
    )[1][:200], "date predicate must prune partitions, not filter rows"


def test_dynamic_overwrite_touches_only_batch_dates(spark, tmp_path):
    path = str(tmp_path / "events_dyn")
    ev = _events(spark)
    pp.write_partitioned(ev, path)
    total_before = spark.read.parquet(path).count()

    # rewrite ONE day with modified values
    one_day = ev.select("event_date").distinct().orderBy("event_date").first()[
        "event_date"
    ]
    batch = ev.where(F.col("event_date") == F.lit(one_day)).withColumn(
        "value", F.col("value") + 1000.0
    )
    n_day = batch.count()
    pp.overwrite_partitions(spark, batch, path)

    after = spark.read.parquet(path)
    assert after.count() == total_before, "row count preserved"
    # the rewritten day carries the new values; other days untouched
    assert (
        after.where(
            (F.col("event_date") == F.lit(one_day)) & (F.col("value") >= 1000.0)
        ).count()
        == n_day
    )
    assert (
        after.where(
            (F.col("event_date") != F.lit(one_day)) & (F.col("value") >= 1000.0)
        ).count()
        == 0
    )


def test_partitioned_roundtrip_exact(spark, tmp_path):
    from tests.helpers import signature

    path = str(tmp_path / "events_rt")
    ev = _events(spark).drop("event_date")
    pp.write_partitioned(pp.with_event_date(ev), path)
    got = spark.read.parquet(path).drop("event_date")
    assert signature(got.columns, [tuple(r) for r in got.collect()]) == signature(
        ev.columns, [tuple(r) for r in ev.collect()]
    )


def test_dynamic_partition_pruning_via_dim_filter(spark, tmp_path):
    """Runtime (dynamic) partition pruning: joining the date-partitioned
    fact against a FILTERED dimension must inject a dynamicpruning
    subquery into the fact scan's partition filters — at 100 TB this is
    the difference between scanning 3 partitions and scanning all of
    them when the pruning predicate only exists on the dim side."""
    path = str(tmp_path / "events_dpp")
    ev = _events(spark)
    pp.write_partitioned(ev, path)
    fact = spark.read.parquet(path)

    dates = sorted(
        r["event_date"]
        for r in ev.select("event_date").distinct().collect()
    )[:3]
    dim = spark.createDataFrame(
        [(d, "picked") for d in dates], "event_date date, tag string"
    )
    joined = fact.join(dim, "event_date").where(F.col("tag") == "picked")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    want = ev.where(F.col("event_date").isin(dates)).count()
    assert joined.count() == want

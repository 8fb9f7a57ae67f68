"""Runtime-filter plan tests: prove the session config lets Catalyst inject
a bloom-filter runtime filter on a selective join — the mechanism that, at
100 TB, prunes the fact-side scan down to rows whose join key might match
the (already filtered) dimension side, before the shuffle.

The default thresholds (`runtime.bloomFilter.applicationSideScanSizeThreshold`
= 10GB) are sized for clusters, so the test lowers them to force injection
at local scale; what it verifies is that nothing in our session/plan shape
BLOCKS the rewrite, and that the filtered result stays exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def bloom_spark(spark):
    prior = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "1KB",
    )
    # broadcast would bypass the shuffle join the bloom filter protects
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in prior.items():
        spark.conf.set(k, v)


def _selective_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, SF_DIR, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("qty"),
    )


def test_bloom_filter_injected_and_exact(bloom_spark):
    df = _selective_join(bloom_spark)
    plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "bloomfilter" in plan or "might_contain" in plan, (
        "selective shuffle join should receive a runtime bloom filter:\n"
        + plan[:2000]
    )
    got = df.collect()[0]

    # same join without runtime filters => identical answer (the filter is
    # a pure pruning optimization, never a semantics change)
    bloom_spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    want = _selective_join(bloom_spark).collect()[0]
    assert (got["n"], got["qty"]) == (want["n"], want["qty"])

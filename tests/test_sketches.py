"""Misra–Gries heavy hitters: the mergeable-summary error bound against
exact counts — the order-independent guarantee the sketch must keep."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.functions.textfns import tokens
from prefect_flow_arc_indexer_spark.operators import sketches
from prefect_flow_arc_indexer_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


def _stream(spark):
    docs = load_table(spark, SF_DIR, "documents", fan_out=True)
    return docs.select(F.explode(tokens(F.col("text"))).alias("token"))


def test_mg_error_bound_and_never_overcounts(spark):
    cap = 64
    stream = _stream(spark)
    exact = {
        r["token"]: r["n"]
        for r in stream.groupBy("token").agg(F.count("*").alias("n")).collect()
    }
    summaries = sketches.mg_summaries(stream, cap).collect()
    # exact per-partition error budget: n_p / (cap + 1), summed over partitions
    part_ns = {r["part_id"]: r["part_n"] for r in summaries}
    budget = sum(n / (cap + 1) for n in part_ns.values())
    merged = {}
    for r in summaries:
        merged[r["token"]] = merged.get(r["token"], 0) + r["est"]
    assert merged, "sketch produced no counters"
    for tok, est in merged.items():
        true = exact[tok]
        assert est <= true, f"{tok}: MG must never overcount ({est} > {true})"
        assert est >= true - budget, (
            f"{tok}: estimate {est} below bound {true - budget:.1f}"
        )


def test_heavy_hitters_contains_separated_top_tokens(spark):
    """Any token whose true count clears the global error budget must
    survive into the sketch's top-k."""
    cap, k = 64, 10
    stream = _stream(spark)
    exact = (
        stream.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .collect()
    )
    total = sum(r["n"] for r in exact)
    n_parts = stream.rdd.getNumPartitions()
    budget = total / (cap + 1)  # upper bound on sum of per-partition budgets
    got = {r["token"] for r in sketches.heavy_hitters(stream, cap, k).collect()}
    assert len(got) == k
    kth = exact[k - 1]["n"] if len(exact) >= k else 0
    for r in exact[:k]:
        if r["n"] - budget > kth:
            assert r["token"] in got, (
                f"{r['token']} (true {r['n']}) separated by budget "
                f"{budget:.0f} but missing from top-{k}"
            )


def test_q_heavy_hitters_registered_shape(spark):
    from prefect_flow_arc_indexer_spark.plans import all_queries

    rq = all_queries()["q_heavy_hitters"]
    assert rq.oracle is None
    df = rq.builder(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == sketches.TOP_K
    assert df.columns == ["token", "est_count"]

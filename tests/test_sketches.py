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


def test_hll_merge_estimates_within_tolerance(spark):
    """Per-segment estimates within 5% of exact; the merged ALL estimate
    within 5% of the global exact distinct (union must not double-count
    customers appearing in several segments)."""
    from pyspark.sql import functions as F

    from prefect_flow_arc_indexer_spark.plans import all_queries
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    rows = all_queries()["q_hll_merge"].builder(spark, SF_DIR).collect()
    by_seg = {r["segment"]: r for r in rows}
    orders = load_table(spark, SF_DIR, "orders")
    for seg, r in by_seg.items():
        if seg == "ALL":
            continue
        exact = r["exact_customers"]
        assert abs(r["approx_customers"] - exact) <= max(0.05 * exact, 2), seg
    global_exact = orders.select("o_custkey").distinct().count()
    got = by_seg["ALL"]["approx_customers"]
    assert abs(got - global_exact) <= max(0.05 * global_exact, 2)
    # the union is over overlapping segments: a naive sum of per-segment
    # estimates would be far above the global exact
    naive_sum = sum(
        r["approx_customers"] for s, r in by_seg.items() if s != "ALL"
    )
    assert naive_sum > 1.5 * global_exact, (
        "fixture should have heavy cross-segment overlap for this test "
        "to be meaningful"
    )

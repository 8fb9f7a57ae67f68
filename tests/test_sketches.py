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


# --------------------------------------------------------------------------
# Count-Min
# --------------------------------------------------------------------------
def test_countmin_never_undercounts_and_bound(spark):
    """CM guarantees est >= exact always, and est <= exact + (n - exact) /
    width * depth-min... the deterministic bound per probe is est - exact <=
    total collisions in its min cell, itself <= stream length; the useful
    assertion is the probabilistic-width bound with generous slack."""
    from prefect_flow_arc_indexer_spark.operators.sketches import (
        CM_WIDTH, q_countmin,
    )

    stream = _stream(spark)
    n = stream.count()
    rows = {r["token"]: r for r in q_countmin(spark, SF_DIR).collect()}
    assert rows, "no probe rows"
    for tok, r in rows.items():
        assert r["est_count"] >= r["exact_count"], tok
        # 3x the expected-collision bound eps*n = e/width * n
        assert r["est_count"] - r["exact_count"] <= 3 * (n / CM_WIDTH) + 1, tok


def test_countmin_partitioning_independent(spark):
    """Unlike MG, CM cell grids merge exactly: estimates must not change
    with the partition layout."""
    from prefect_flow_arc_indexer_spark.operators.sketches import (
        _cm_partition, cm_cell, CM_DEPTH,
    )
    import pandas as pd

    toks = ["a", "b", "a", "c", "a", "b", "d"] * 10
    whole = list(_cm_partition(iter([pd.DataFrame({"token": toks})])))[0]
    split = pd.concat(
        list(_cm_partition(iter([pd.DataFrame({"token": toks[:23]})])))
        + list(_cm_partition(iter([pd.DataFrame({"token": toks[23:]})])))
    )
    merged = split.groupby(["d", "w"], as_index=False)["cnt"].sum()
    a = whole.sort_values(["d", "w"]).reset_index(drop=True)
    b = merged.sort_values(["d", "w"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # probe read-out equals the true count when no collision exists
    est_a = min(
        int(whole.loc[(whole.d == d) & (whole.w == cm_cell("a", d)), "cnt"].iloc[0])
        for d in range(CM_DEPTH)
    )
    assert est_a >= toks.count("a")

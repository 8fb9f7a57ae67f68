"""Semantic unit tests for the entity-feature operators on synthetic frames
(the oracle gate checks parity on real data; these pin the SEMANTICS on
hand-built cases where the right answer is obvious)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR


def test_gaps_islands_counts_runs_correctly(spark):
    """Days {1,2,3, 7, 9,10} => islands [1-3],[7],[9-10]: 3 islands,
    longest 3, 6 active days."""
    from pyspark.sql import Window

    days = spark.createDataFrame(
        [(1, d) for d in (1, 2, 3, 7, 9, 10)], "user_id long, d int"
    )
    rn = days.withColumn(
        "rn", F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    )
    islands = rn.groupBy(
        "user_id", (F.col("d") - F.col("rn")).alias("island")
    ).agg(F.count("*").alias("run_len"))
    out = islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("run_len").alias("longest_run"),
        F.sum("run_len").alias("active_days"),
    ).collect()[0]
    assert (out["n_islands"], out["longest_run"], out["active_days"]) == (3, 3, 6)


def test_decayed_sum_truncates_to_latest_k(spark):
    """Only the newest DECAY_K events may contribute: a user with more
    events than the cutoff uses exactly DECAY_K of them."""
    from prefect_flow_arc_indexer_spark.operators.feature_ops import DECAY_K

    out = {
        r["user_id"]: r
        for r in all_queries()["q_decayed_sum"].builder(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    counts = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for uid, r in out.items():
        assert r["n_used"] == min(DECAY_K, counts[uid])


def test_weighted_sample_draws_k_and_respects_spans(spark):
    """Systematic PPS: ~K docs drawn, and a doc can only be drawn if a
    ticket boundary lands inside its cumulative-weight span."""
    from prefect_flow_arc_indexer_spark.operators.sampling import WEIGHTED_K

    rows = all_queries()["q_weighted_sample"].builder(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= WEIGHTED_K
    tickets = [r["ticket"] for r in rows]
    assert len(set(tickets)) == len(tickets)  # one doc per ticket


def test_mixture_weights_rates_bounded_and_shares_sum_to_one(spark):
    rows = all_queries()["q_mixture_weights"].builder(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert 0.0 < r["sample_rate"] <= 1.0


def test_dedup_incremental_invariants(spark):
    """Existing docs never appear in the verdict; every within-batch dup
    points at a smaller id or an existing keeper; verdict covers exactly
    the new slice."""
    from prefect_flow_arc_indexer_spark.operators.sampling import split_bucket

    out = all_queries()["q_dedup_incremental"].builder(spark, SF_DIR)
    rows = out.collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mem = {
        r["doc_id"]: r["e"]
        for r in docs.select(
            "doc_id",
            (split_bucket(F.col("doc_id"), "corpus:") < 80).alias("e"),
        ).collect()
    }
    new_ids = {d for d, e in mem.items() if not e}
    assert {r["doc_id"] for r in rows} == new_ids
    for r in rows:
        if r["is_dup"]:
            partner = r["dup_of"]
            assert mem[partner] or partner < r["doc_id"]
        else:
            assert r["dup_of"] is None

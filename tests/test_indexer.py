"""Reference-SQL-surface operators (SURVEY §2.1-2.3) vs the DuckDB oracle at
sf0.001, plus shape/semantic assertions the hash compare can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators import indexer
from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources.parquet import index_documents
from tests.conftest import SF_DIR
from tests.helpers import assert_matches_oracle

PHASE1 = [
    "q_distinct_indexes",
    "q_index_order",
    "q_count_active",
    "q_count_updated",
    "q_full_select",
    "q_incremental_select",
    "q_json_extract",
    "q_lower_ids",
    "q_index_name",
    "q_doc_charlen",
    "q_cdc_merge",
    "q_variant_stats",
]


@pytest.mark.parametrize("name", PHASE1)
def test_oracle_parity(spark, duck, name):
    rq = all_queries()[name]
    assert rq.oracle is not None
    assert_matches_oracle(rq.builder(spark, SF_DIR), duck, rq.oracle)


def test_index_documents_schema(spark):
    df = index_documents(spark, SF_DIR)
    assert dict(df.dtypes) == {
        "index": "string",
        "id": "string",
        "document": "string",
        "is_deleted": "boolean",
        "updated_at": "timestamp",
    }


def test_tombstones_present_both_ways(spark):
    # the derived is_deleted flag must exercise both branches
    counts = dict(
        index_documents(spark, SF_DIR).groupBy("is_deleted").count().collect()
    )
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0


def test_watermark_is_inclusive(spark):
    # T2: boundary row with updated_at == watermark must be included
    df = index_documents(spark, SF_DIR).limit(0)
    boundary = spark.createDataFrame(
        [("click", "x", "{}", False, indexer.WATERMARK)],
        "`index` string, id string, document string, is_deleted boolean, updated_at string",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    out = boundary.where(
        F.col("updated_at") >= F.lit(indexer.WATERMARK).cast("timestamp")
    )
    assert out.count() == 1


def test_index_order_sorted_ascending(spark):
    rows = indexer.q_index_order(spark, SF_DIR).collect()
    assert len(rows) == len(indexer.TARGET_INDEXES)
    counts = [r.doc_count for r in rows]
    assert counts == sorted(counts)


def test_full_select_excludes_tombstones(spark):
    df = indexer.q_full_select(spark, SF_DIR)
    assert df.where(F.col("is_deleted")).count() == 0


def test_incremental_select_includes_tombstones(spark):
    df = indexer.q_incremental_select(spark, SF_DIR)
    assert df.where(F.col("is_deleted")).count() > 0


def test_pushdown_reaches_scan(spark):
    """Filters and the 4-col projection must reach the parquet scan."""
    plan = (
        indexer.q_full_select(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "IsNotNull(event_type)" in plan or "In(event_type" in plan


def test_sync_cycle_is_consistent_with_cdc_merge_semantics(spark):
    """live_after must equal carried + applied recomputed independently,
    and the pending split must sum: n_pending = n_upserts + n_deletes."""
    from pyspark.sql import functions as F

    from prefect_flow_arc_indexer_spark.operators.indexer import WATERMARK
    from prefect_flow_arc_indexer_spark.plans import all_queries
    from tests.conftest import SF_DIR

    rows = {
        r["index_name"]: r
        for r in all_queries()["q_sync_cycle"].builder(spark, SF_DIR).collect()
    }
    assert rows
    for r in rows.values():
        assert r["n_pending"] == r["n_upserts"] + r["n_deletes"]
        assert r["skip_batch"] == (r["n_pending"] == 0)
        assert r["live_after"] >= 0

    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "user_id", "ts", "event_id"
    ).collect()
    latest_before, latest_after = {}, {}
    for e in ev:
        k = (e["event_type"], e["user_id"])
        stamp = (e["ts"], e["event_id"])
        tgt = latest_before if str(e["ts"]) < WATERMARK else latest_after
        if k not in tgt or stamp > tgt[k][0]:
            tgt[k] = (stamp, e["event_id"] % 13 == 0)
    for idx in rows:
        live = {
            k for k, (_, dead) in latest_before.items()
            if k[0] == idx and not dead
        }
        batch = {k: dead for k, (_, dead) in latest_after.items() if k[0] == idx}
        after = {k for k in live if k not in batch} | {
            k for k, dead in batch.items() if not dead
        }
        assert rows[idx]["live_before"] == len(live)
        assert rows[idx]["live_after"] == len(after)

"""Phase-2 dataflow operators (disguised relational ops, SURVEY §2.4/§2.5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators import actions, catalog_ops
from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources import catalog
from prefect_flow_arc_indexer_spark.sources.parquet import index_documents
from tests.conftest import SF_DIR
from tests.helpers import assert_matches_oracle

PHASE2 = [
    "q_doc_actions",
    "q_doc_actions_full",
    "q_anti_join_cleanup",
    "q_dup_alias_having",
    "q_dup_alias_semi",
    "q_count_reconcile",
    "q_schema_probe",
    "q_topk_tail",
]


@pytest.mark.parametrize("name", PHASE2)
def test_oracle_parity(spark, duck, name):
    rq = all_queries()[name]
    assert_matches_oracle(rq.builder(spark, SF_DIR), duck, rq.oracle)


def test_doc_actions_reference_smoke_fixture(spark):
    """The reference's 4-row smoke table (test_instance.sh:14-15) routed
    through incremental action mapping, with one tombstone added."""
    rows = [
        ("idx", "1", '{"name": "Lennert"}', False),
        ("idx", "2", '{"name": "Milan"}', False),
        ("idx", "3", '{"name": "Miel"}', True),
        ("idx", "4", '{"name": "Bart"}', False),
    ]
    docs = spark.createDataFrame(
        rows, "`index` string, id string, document string, is_deleted boolean"
    )
    out = {r["_id"]: r for r in actions.doc_actions(docs, None).collect()}
    assert out["3"]["_op_type"] == "delete" and out["3"]["_source"] is None
    assert out["1"]["_op_type"] == "index" and out["1"]["_index"] == "idx"


def test_doc_actions_full_targets_generation(spark):
    docs = spark.createDataFrame(
        [("idx", "1", "{}", False), ("idx", "2", "{}", True)],
        "`index` string, id string, document string, is_deleted boolean",
    )
    rows = actions.doc_actions(docs, "2024-02-01t00.00.00").collect()
    # tombstones excluded in full sync; generation-suffixed target
    assert [r["_index"] for r in rows] == ["idx_2024-02-01t00.00.00"]
    assert rows[0]["_op_type"] == "index"


def test_anti_join_finds_only_orphan(spark):
    names = [
        r.index_name
        for r in catalog_ops.q_anti_join_cleanup(spark, SF_DIR).collect()
    ]
    assert names == [catalog.ORPHAN_INDEX]


def test_dup_aliases_are_the_long_names(spark):
    rows = catalog_ops.q_dup_alias_having(spark, SF_DIR).collect()
    assert {r.alias for r in rows} == {"purchase", "signup"}
    assert all(r.generation_count == 2 for r in rows)


def test_catalog_joins_are_broadcast(spark):
    plan = (
        catalog_ops.q_anti_join_cleanup(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan


def test_topk_tail_tags_two_large(spark):
    rows = catalog_ops.q_topk_tail(spark, SF_DIR).collect()
    large = [r for r in rows if r.tag == "pg-indexer-large"]
    small = [r for r in rows if r.tag == "pg-indexer"]
    assert len(large) == 2
    assert min(r.doc_count for r in large) >= max(r.doc_count for r in small)


def test_reconcile_flags_mismatch(spark):
    rows = catalog_ops.q_count_reconcile(spark, SF_DIR).collect()
    # simulated ES state is stale (pre-watermark), so at least one mismatch
    assert any(not r.count_match for r in rows)
    assert all(
        (r.pg_count == r.es_count) == r.count_match
        for r in rows
        if r.pg_count is not None and r.es_count is not None
    )

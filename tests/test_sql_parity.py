"""SQL-interface parity: the reference's seven Postgres statements
(reference ``flows/main_flow.py:67,120,153,235,317,335,575``; SURVEY §2.9),
written as near-verbatim ANSI SQL and executed through ``spark.sql`` over a
registered ``index_documents`` temp view, must return exactly what the
registered DataFrame builders return.

This pins the engine's second API surface: a user can drive every reference
query through SQL (the Postgres dialect's ``->``/``->>`` JSONB operators
become ``get_json_object``; everything else is unchanged) and get the same
plans Catalyst gives the DataFrame formulation.
"""

from __future__ import annotations

import pytest

from prefect_flow_arc_indexer_spark.operators.indexer import (
    PROBE_INDEX,
    TARGET_INDEXES,
    WATERMARK,
)
from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources.parquet import index_documents
from tests.conftest import SF_DIR

_IN = ", ".join(f"'{x}'" for x in TARGET_INDEXES)

# name -> the reference statement in spark.sql form
SQL_SURFACE = {
    "q_distinct_indexes": """
        SELECT DISTINCT `index` FROM index_documents
         WHERE `index` IS NOT NULL""",
    "q_index_order": f"""
        SELECT `index`, count(id) AS doc_count
          FROM index_documents
         WHERE `index` IN ({_IN})
         GROUP BY `index`
         ORDER BY doc_count ASC, `index` ASC""",
    "q_count_active": f"""
        SELECT count(id) AS active_count
          FROM index_documents
         WHERE `index` = '{PROBE_INDEX}' AND NOT is_deleted""",
    "q_count_updated": f"""
        SELECT count(id) AS updated_count
          FROM index_documents
         WHERE `index` = '{PROBE_INDEX}'
           AND updated_at >= TIMESTAMP '{WATERMARK}'""",
    "q_full_select": f"""
        SELECT `index`, id, document, is_deleted
          FROM index_documents
         WHERE `index` IN ({_IN}) AND NOT is_deleted""",
    "q_incremental_select": f"""
        SELECT `index`, id, document, is_deleted
          FROM index_documents
         WHERE `index` IN ({_IN})
           AND updated_at >= TIMESTAMP '{WATERMARK}'""",
    # reference :67 — the schema probe's JSONB path extraction
    # (document->'schema_maintainer'->>'schema_name'); the registered
    # q_json_extract generalizes the same path op over the corpus
    "q_json_extract": f"""
        SELECT id, get_json_object(document, '$.k') AS schema_name
          FROM index_documents
         WHERE `index` = '{PROBE_INDEX}'""",
}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", sorted(SQL_SURFACE))
def test_sql_matches_dataframe_builder(spark, name):
    index_documents(spark, SF_DIR).createOrReplaceTempView("index_documents")
    got = _rows(spark.sql(SQL_SURFACE[name]))
    want = _rows(all_queries()[name].builder(spark, SF_DIR))
    assert got == want

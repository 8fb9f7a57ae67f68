"""Bulk-action routing — the reference's ``generate_actions`` generator
(reference ``flows/main_flow.py:366-395``) as pure column expressions.

The reference walks the cursor row-by-row in Python and emits one ES bulk
action dict per row; here the same row->action mapping is a ``CASE`` + struct
assembly that stays inside whole-stage codegen (SURVEY P12/T3 and §2.8: a
row-at-a-time UDTF deliberately re-expressed as built-ins — at 100 TB the
Python boundary would dominate the runtime).

Two flavors, matching the reference's two sync modes:

- **full sync** (``timestamp`` set): tombstones are *excluded* (the scan
  already filtered them, ``flows/main_flow.py:340``) and actions target the
  new generation ``{index}_{timestamp}``;
- **incremental** (``timestamp`` None): tombstones flow through as
  ``_op_type='delete'`` with a NULL ``_source`` and actions target the live
  alias (``flows/main_flow.py:368,378-395``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.operators.indexer import (
    TARGET_INDEXES,
    WATERMARK,
    _IN_LIST,
)
from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import (
    IDX_DOCS_CTE,
    index_documents,
)

# Fixed generation timestamp for the oracle-checked full-sync flavor
# (reference format %Y-%m-%dt%H.%M.%S, flows/main_flow.py:647).
GEN_TS = "2024-02-01t00.00.00"


def doc_actions(docs: DataFrame, timestamp: str | None) -> DataFrame:
    """Map source rows to sink actions (the engine-level operator).

    ``docs`` must carry (index, id, document, is_deleted).
    """
    if timestamp is not None:
        return docs.where(~F.col("is_deleted")).select(
            F.concat_ws("_", "index", F.lit(timestamp)).alias("_index"),
            F.col("id").alias("_id"),
            F.lit("index").alias("_op_type"),
            F.col("document").alias("_source"),
        )
    return docs.select(
        F.col("index").alias("_index"),
        F.col("id").alias("_id"),
        F.when(F.col("is_deleted"), F.lit("delete"))
        .otherwise(F.lit("index"))
        .alias("_op_type"),
        F.when(F.col("is_deleted"), F.lit(None).cast("string"))
        .otherwise(F.col("document"))
        .alias("_source"),
    )


@register(
    "q_doc_actions",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT "index" AS _index,
       id AS _id,
       CASE WHEN is_deleted THEN 'delete' ELSE 'index' END AS _op_type,
       CASE WHEN is_deleted THEN NULL ELSE document END AS _source
  FROM index_documents
 WHERE "index" IN ({_IN_LIST}) AND updated_at >= TIMESTAMP '{WATERMARK}'
""",
    doc="P12/T3: incremental action stream — CASE routing of upserts vs "
    "deletes (reference flows/main_flow.py:378-395)",
)
def q_doc_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = index_documents(spark, sf_dir).where(
        F.col("index").isin(*TARGET_INDEXES)
        & (F.col("updated_at") >= F.lit(WATERMARK).cast("timestamp"))
    )
    return doc_actions(docs, timestamp=None)


@register(
    "q_doc_actions_full",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT concat("index", '_', '{GEN_TS}') AS _index,
       id AS _id,
       'index' AS _op_type,
       document AS _source
  FROM index_documents
 WHERE "index" IN ({_IN_LIST}) AND NOT is_deleted
""",
    doc="P12+P9: full-sync action stream targeting a fresh generation "
    "(reference flows/main_flow.py:368,340)",
)
def q_doc_actions_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = index_documents(spark, sf_dir).where(
        F.col("index").isin(*TARGET_INDEXES)
    )
    return doc_actions(docs, timestamp=GEN_TS)

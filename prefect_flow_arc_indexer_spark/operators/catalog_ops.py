"""Catalog-shaped dataflow operators — the Python list-comprehension joins of
the reference made explicit (SURVEY §2.4 J1-J3, §2.3 A5/A6, §2.5 O3, §2.1 S5).

The reference matches logical aliases to physical index names by substring
containment (``alias in index``, reference ``flows/main_flow.py:500,510``) —
a theta-join. Catalog cardinality is tiny (tens of rows), so the right
physical strategy is a broadcast nested-loop join: we wrap the small side in
``F.broadcast`` explicitly so the plan never degenerates to a shuffled
cartesian product if the catalog grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prefect_flow_arc_indexer_spark.operators.indexer import WATERMARK
from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.catalog import (
    ALIASES_CTE,
    PHYSICAL_CTE,
    aliases,
    physical_indexes,
)
from prefect_flow_arc_indexer_spark.sources.parquet import (
    IDX_DOCS_CTE,
    index_documents,
)

_CATALOG_CTES = f"{IDX_DOCS_CTE},\n{ALIASES_CTE},\n{PHYSICAL_CTE}"

def _contains():
    # lazy: F.expr needs an active SparkContext
    return F.expr("contains(index_name, alias)")


@register(
    "q_anti_join_cleanup",
    oracle=f"""WITH {_CATALOG_CTES}
SELECT index_name
  FROM physical p
 WHERE NOT EXISTS (
         SELECT 1 FROM aliases a WHERE contains(p.index_name, a.alias))
""",
    doc="J1/X8: orphan physical indexes — anti join on substring containment "
    "(reference flows/main_flow.py:499-501)",
)
def q_anti_join_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return physical_indexes(spark, sf_dir).join(
        F.broadcast(aliases(spark, sf_dir)), _contains(), "left_anti"
    )


def _alias_generation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alias -> number of physical generations (A5 hash aggregation,
    reference flows/main_flow.py:504-507)."""
    return (
        physical_indexes(spark, sf_dir)
        .join(F.broadcast(aliases(spark, sf_dir)), _contains(), "inner")
        .groupBy("alias")
        .agg(F.count("*").alias("generation_count"))
    )


_ALIAS_COUNT_SQL = """
SELECT a.alias, count(*) AS generation_count
  FROM physical p JOIN aliases a ON contains(p.index_name, a.alias)
 GROUP BY a.alias
"""


@register(
    "q_dup_alias_having",
    oracle=f"""WITH {_CATALOG_CTES}
, alias_counts AS ({_ALIAS_COUNT_SQL})
SELECT alias, generation_count
  FROM alias_counts
 WHERE generation_count > 1
""",
    doc="A5+A6: aliases with multiple physical generations — HAVING-style "
    "post-agg filter (reference flows/main_flow.py:504-507)",
)
def q_dup_alias_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _alias_generation_counts(spark, sf_dir).where(
        F.col("generation_count") > 1
    )


@register(
    "q_dup_alias_semi",
    oracle=f"""WITH {_CATALOG_CTES}
, alias_counts AS ({_ALIAS_COUNT_SQL})
SELECT index_name
  FROM physical p
 WHERE EXISTS (
         SELECT 1 FROM alias_counts c
          WHERE c.generation_count > 1 AND contains(p.index_name, c.alias))
""",
    doc="J2: physical indexes behind duplicated aliases — semi join on "
    "containment (reference flows/main_flow.py:509-511)",
)
def q_dup_alias_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    dups = _alias_generation_counts(spark, sf_dir).where(
        F.col("generation_count") > 1
    )
    return physical_indexes(spark, sf_dir).join(
        F.broadcast(dups), _contains(), "left_semi"
    )


@register(
    "q_count_reconcile",
    oracle=f"""WITH {IDX_DOCS_CTE},
pg AS (
  SELECT "index", count(id) AS pg_count
    FROM index_documents WHERE NOT is_deleted GROUP BY "index"
),
es AS (
  SELECT "index", count(id) AS es_count
    FROM index_documents
   WHERE NOT is_deleted AND updated_at < TIMESTAMP '{WATERMARK}'
   GROUP BY "index"
)
SELECT coalesce(pg."index", es."index") AS "index",
       pg.pg_count, es.es_count,
       coalesce(pg.pg_count = es.es_count, FALSE) AS count_match
  FROM pg FULL OUTER JOIN es ON pg."index" = es."index"
""",
    doc="J3/X7: source-vs-sink count reconciliation — full outer join + "
    "equality flag (reference flows/main_flow.py:229-254)",
)
def q_count_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = index_documents(spark, sf_dir)
    pg = (
        docs.where(~F.col("is_deleted"))
        .groupBy("index")
        .agg(F.count("id").alias("pg_count"))
    )
    # The "ES side" is simulated as the state an earlier sync would have
    # left behind: live docs older than the current watermark.
    es = (
        docs.where(
            ~F.col("is_deleted")
            & (F.col("updated_at") < F.lit(WATERMARK).cast("timestamp"))
        )
        .groupBy("index")
        .agg(F.count("id").alias("es_count"))
    )
    joined = pg.alias("pg").join(
        es.alias("es"), F.col("pg.index") == F.col("es.index"), "full_outer"
    )
    return joined.select(
        F.coalesce("pg.index", "es.index").alias("index"),
        "pg_count",
        "es_count",
        F.coalesce(
            F.col("pg_count") == F.col("es_count"), F.lit(False)
        ).alias("count_match"),
    )


@register(
    "q_schema_probe",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT "index",
       arg_min(json_extract_string(document, '$.k'), CAST(id AS BIGINT)) AS es_schema_name,
       arg_max(json_extract_string(document, '$.k'), CAST(id AS BIGINT)) AS pg_schema_name,
       arg_min(json_extract_string(document, '$.k'), CAST(id AS BIGINT))
         IS DISTINCT FROM
       arg_max(json_extract_string(document, '$.k'), CAST(id AS BIGINT)) AS org_name_changed
  FROM index_documents
 WHERE "index" IS NOT NULL
 GROUP BY "index"
""",
    doc="S5/T7: schema-drift probe — limit-1 doc per index from 'ES' vs "
    "current source value, inequality triggers full rebuild "
    "(reference flows/main_flow.py:37-86). Probe rows pinned to min/max id "
    "for determinism (the reference grabs an arbitrary doc). Plan: a single "
    "min_by/max_by hash aggregation (map-side partial) — not the window-sort "
    "formulation, which would full-sort every index partition twice.",
)
def q_schema_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        index_documents(spark, sf_dir)
        .where(F.col("index").isNotNull())
        .select(
            "index",
            F.get_json_object("document", "$.k").alias("schema_name"),
            F.col("id").cast("bigint").alias("id_num"),
        )
    )
    return (
        docs.groupBy("index")
        .agg(
            F.min_by("schema_name", "id_num").alias("es_schema_name"),
            F.max_by("schema_name", "id_num").alias("pg_schema_name"),
        )
        .select(
            "index",
            "es_schema_name",
            "pg_schema_name",
            (
                ~F.col("es_schema_name").eqNullSafe(F.col("pg_schema_name"))
            ).alias("org_name_changed"),
        )
    )


@register(
    "q_topk_tail",
    oracle=f"""WITH {IDX_DOCS_CTE},
ordered AS (
  SELECT "index", count(id) AS doc_count,
         row_number() OVER (ORDER BY count(id) DESC, "index" ASC) AS rk
    FROM index_documents
   WHERE "index" IS NOT NULL
   GROUP BY "index"
)
SELECT "index", doc_count,
       CASE WHEN rk <= 2 THEN 'pg-indexer-large' ELSE 'pg-indexer' END AS tag
  FROM ordered
""",
    doc="O3/X3: the 2 largest indexes get the large-concurrency tag "
    "(reference flows/main_flow.py:721) — the one window-function-shaped "
    "construct in the reference",
)
def q_topk_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        index_documents(spark, sf_dir)
        .where(F.col("index").isNotNull())
        .groupBy("index")
        .agg(F.count("id").alias("doc_count"))
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("doc_count").desc(), F.col("index").asc())
    )
    return counts.select(
        "index",
        "doc_count",
        F.when(rk <= 2, F.lit("pg-indexer-large"))
        .otherwise(F.lit("pg-indexer"))
        .alias("tag"),
    )

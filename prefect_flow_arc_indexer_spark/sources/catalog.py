"""Sink-catalog DataFrames — the stand-in for the Elasticsearch catalog the
reference inspects (``get_current_es_indexes``, reference ``flows/
main_flow.py:260-270``; alias map handling ``flows/main_flow.py:488-520``).

The catalog has two shapes:

- **aliases** — logical names readers use (one per distinct source ``index``);
- **physical indexes** — timestamped generations ``{alias}_{ts}``
  (reference ``flows/main_flow.py:182``) plus orphans left by older runs.

For oracle-checked queries the catalog must be *derivable* from the test
tables identically in Spark and DuckDB, so generations are deterministic:
every alias has a 2024-01-10 generation, aliases longer than 5 chars also
have a 2024-01-20 generation (a "duplicate alias" case, reference
``flows/main_flow.py:504-511``), and one hardcoded orphan simulates an index
whose source rows disappeared (anti-join cleanup target, ``flows/
main_flow.py:499-501``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.sources.parquet import index_documents

GEN1 = "2024-01-10t00.00.00"
GEN2 = "2024-01-20t00.00.00"
ORPHAN_INDEX = "legacy_2023-12-31t00.00.00"


def aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct non-null logical index names (SURVEY A1)."""
    return (
        index_documents(spark, sf_dir)
        .where(F.col("index").isNotNull())
        .select(F.col("index").alias("alias"))
        .distinct()
    )


def physical_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulated physical-index catalog: per-alias generations + one orphan.

    Both generations come out of ONE pass over the aliases (explode of a
    2-slot array, null slot filtered) rather than a union of two scans —
    queries that compose physical+aliases several times (the dup-alias semi
    join) would otherwise re-scan the source once per union branch.
    """
    al = aliases(spark, sf_dir)
    gens = al.select(
        F.explode(
            F.array(
                F.concat_ws("_", "alias", F.lit(GEN1)),
                F.when(
                    F.length("alias") > 5,
                    F.concat_ws("_", "alias", F.lit(GEN2)),
                ),
            )
        ).alias("index_name")
    ).where(F.col("index_name").isNotNull())
    orphan = spark.range(1).select(F.lit(ORPHAN_INDEX).alias("index_name"))
    return gens.unionAll(orphan)


# Matching DuckDB CTEs (compose after IDX_DOCS_CTE).
ALIASES_CTE = """aliases AS (
  SELECT DISTINCT "index" AS alias
    FROM index_documents
   WHERE "index" IS NOT NULL
)"""

PHYSICAL_CTE = f"""physical AS (
  SELECT concat(alias, '_', '{GEN1}') AS index_name FROM aliases
  UNION ALL
  SELECT concat(alias, '_', '{GEN2}') AS index_name FROM aliases WHERE length(alias) > 5
  UNION ALL
  SELECT '{ORPHAN_INDEX}' AS index_name
)"""

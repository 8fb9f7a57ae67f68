"""Atomic-publish lifecycle surfaced as an oracle-checkable query.

SURVEY §2.7 X6 (atomic publish / alias swap) was pytest-only until this
round; ``q_publish_manifest`` runs the versioned parquet sink's full
write -> publish -> swap -> drop-old lifecycle (reference
``flows/main_flow.py:524-557`` ``swap_indexes``: put_alias on the new
generation, delete the superseded index) and returns the resulting
manifest/generation state as a DataFrame the driver gates on DuckDB:

- ``live_generation`` proves the alias points at the SECOND (newest)
  generation after the swap;
- ``n_live_docs`` is counted by READING BACK the published alias (not from
  the input plan) — a wrong or half-flipped manifest shows up as a count
  mismatch against the oracle's expectation from the base table;
- ``n_disk_generations`` == 1 proves exactly-one-live-generation: the
  superseded generation was physically dropped by the swap (reference
  cleanup semantics);
- ``old_dropped`` double-checks the superseded path is gone.

Scale shape: each generation write is an ordinary distributed parquet
write; the COMMIT is a driver-side atomic manifest rename — O(1), no data
motion — exactly the ES alias-swap / metastore-commit shape at 100 TB.
Per-alias facts (manifest entry, on-disk generation list) are
catalog-bounded driver literals; only the read-back counts run as Spark
jobs.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.functions.caching import CheckpointRelease
from prefect_flow_arc_indexer_spark.operators.indexer import (
    TARGET_INDEXES,
    WATERMARK,
)
from prefect_flow_arc_indexer_spark.pipeline.sinks import VersionedSink
from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import (
    IDX_DOCS_CTE,
    index_documents,
)

# Fixed generation timestamps (TS_FORMAT-parseable) so the published
# generation names are deterministic and the oracle can embed them.
_T1 = "2024-01-01t00.00.00"
_T2 = "2024-01-02t00.00.00"

_IN_LIST = ", ".join(f"'{x}'" for x in TARGET_INDEXES)
_VALUES = ", ".join(f"('{x}')" for x in TARGET_INDEXES)


@register(
    "q_publish_manifest",
    oracle=f"""WITH {IDX_DOCS_CTE},
live AS (
  SELECT "index" AS alias, count(id) AS n
    FROM index_documents
   WHERE "index" IN ({_IN_LIST}) AND NOT is_deleted
   GROUP BY "index"
)
SELECT v.alias,
       v.alias || '_{_T2}' AS live_generation,
       CAST(coalesce(l.n, 0) AS BIGINT) AS n_live_docs,
       CAST(1 AS BIGINT) AS n_disk_generations,
       TRUE AS old_dropped
  FROM (VALUES {_VALUES}) AS v(alias)
  LEFT JOIN live l ON l.alias = v.alias
""",
    doc="X6 atomic publish, driver-gated (VERDICT r10 task 6): per target "
    "alias, write generation 1 (the pre-watermark snapshot), publish it, "
    "write generation 2 (the full live set), publish again with the "
    "reference's drop-old swap semantics — then report the manifest's "
    "live generation, the live doc count READ BACK through the alias, "
    "the number of on-disk generations (must be exactly 1), and whether "
    "the superseded generation's path is gone. The oracle predicts all "
    "four from the base table + the swap contract; any half-published "
    "state, stale alias, or undropped generation breaks the match. "
    "Rollback-on-failure for the same sink is covered by pytest "
    "(tests/test_indexer.py's X5 path).",
)
def q_publish_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = tempfile.mkdtemp(prefix="publish_manifest_")
    try:
        sink = VersionedSink(work)
        docs = index_documents(spark, sf_dir).where(
            F.col("index").isin(*TARGET_INDEXES) & ~F.col("is_deleted")
        )
        per_alias: list[DataFrame] = []
        for alias in TARGET_INDEXES:
            alias_docs = docs.where(F.col("index") == alias).select(
                "index", "id", "document", "is_deleted", "updated_at"
            )
            # generation 1: the pre-watermark snapshot (what a first full
            # sync would have published before the CDC window)
            gen1 = sink.write_generation(
                alias_docs.where(
                    F.col("updated_at") < F.lit(WATERMARK).cast("timestamp")
                ),
                alias,
                _T1,
            )
            sink.publish(alias, gen1)
            # generation 2: the full live set — the rebuild that supersedes
            # it; publish() flips the alias and drops gen1 (reference swap)
            gen2 = sink.write_generation(alias_docs, alias, _T2)
            sink.publish(alias, gen2)
            manifest = sink.read_manifest()
            n_disk = len(sink.generations_of(alias))
            old_dropped = not os.path.isdir(sink.generation_path(gen1))
            per_alias.append(
                sink.read_alias(spark, alias)
                .agg(F.count("*").cast("bigint").alias("n_live_docs"))
                .select(
                    F.lit(alias).alias("alias"),
                    F.lit(manifest[alias]).alias("live_generation"),
                    "n_live_docs",
                    F.lit(n_disk).cast("bigint").alias(
                        "n_disk_generations"
                    ),
                    F.lit(old_dropped).alias("old_dropped"),
                )
            )
        out = reduce(
            lambda a, b: a.unionByName(b), per_alias
        ).localCheckpoint(eager=True)
        # eager checkpoint: the result must survive the finally-block's
        # rmtree of the sink directory; release is the caller's
        out.ckpt_release = CheckpointRelease(out)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)

"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query on sf0.001; ``queries``/``oracle_sql``
expose the full registered inventory (see
``prefect_flow_arc_indexer_spark/plans/registry.py`` — operator modules
register (Spark builder, DuckDB oracle) pairs there).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from prefect_flow_arc_indexer_spark.plans import oracle_map, query_map  # noqa: E402
from prefect_flow_arc_indexer_spark.session import prepare_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_index_order: scan→filter→agg→sort) on sf0.001."""
    prepare_session(spark)
    return query_map()["q_index_order"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """name -> (spark, sf_dir) -> DataFrame, one per implemented operator."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in query_map().items()}


def oracle_sql() -> dict[str, str]:
    """name -> DuckDB SQL equivalent (omitted => rows-only check)."""
    return oracle_map()

"""Query registry — the single source of truth behind ``__spark_entry__``.

Each operator module registers its queries here with a name, a Spark builder
``(spark, sf_dir) -> DataFrame``, and (when SQL-expressible) the DuckDB oracle
the driver compares against. Importing ``operators`` populates the registry;
``query_map()/oracle_map()`` are what ``__spark_entry__.queries()/
oracle_sql()`` return.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that contribute queries; imported lazily so a bug in one extension
# module can be isolated without taking down the whole registry consumer.
_OPERATOR_MODULES = (
    "prefect_flow_arc_indexer_spark.operators.indexer",
    "prefect_flow_arc_indexer_spark.operators.actions",
    "prefect_flow_arc_indexer_spark.operators.catalog_ops",
    "prefect_flow_arc_indexer_spark.operators.dedup",
    "prefect_flow_arc_indexer_spark.operators.similarity",
    "prefect_flow_arc_indexer_spark.operators.text_analysis",
    "prefect_flow_arc_indexer_spark.operators.textprep",
    "prefect_flow_arc_indexer_spark.operators.sessionize",
    "prefect_flow_arc_indexer_spark.operators.relational",
    "prefect_flow_arc_indexer_spark.operators.relational_ext",
    "prefect_flow_arc_indexer_spark.operators.analytics",
    "prefect_flow_arc_indexer_spark.operators.temporal",
    "prefect_flow_arc_indexer_spark.operators.cdc",
    "prefect_flow_arc_indexer_spark.operators.profiling",
    "prefect_flow_arc_indexer_spark.operators.behavior",
    "prefect_flow_arc_indexer_spark.operators.feature_ops",
    "prefect_flow_arc_indexer_spark.operators.sketches",
    "prefect_flow_arc_indexer_spark.operators.custom_udf",
    "prefect_flow_arc_indexer_spark.operators.sampling",
    "prefect_flow_arc_indexer_spark.operators.corpus_quality",
    "prefect_flow_arc_indexer_spark.operators.layout",
    "prefect_flow_arc_indexer_spark.operators.graph_text",
    "prefect_flow_arc_indexer_spark.operators.pipeline_e2e",
    "prefect_flow_arc_indexer_spark.multimodal.binary",
)


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    builder: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}
_LOADED = False


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, doc)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_queries() -> dict[str, RegisteredQuery]:
    _load()
    return dict(_REGISTRY)


def query_map() -> dict[str, QueryFn]:
    _load()
    return {n: r.builder for n, r in _REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    _load()
    return {n: r.oracle for n, r in _REGISTRY.items() if r.oracle is not None}

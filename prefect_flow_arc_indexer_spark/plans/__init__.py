from prefect_flow_arc_indexer_spark.plans.registry import (
    all_queries,
    oracle_map,
    query_map,
    register,
)

__all__ = ["register", "query_map", "oracle_map", "all_queries"]

from prefect_flow_arc_indexer_spark.sources.parquet import (
    TABLES,
    index_documents,
    load_table,
)

__all__ = ["TABLES", "load_table", "index_documents"]

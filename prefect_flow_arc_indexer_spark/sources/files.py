"""Unified file-source reader: parquet / json / csv behind one interface,
with explicit schemas (never inference in production paths — an inference
pass is a full extra scan at 100 TB and can silently drift types between
runs).

The reference reads only Postgres (SURVEY §2.1); file sources are part of
the engine's extension surface so pipelines can stage CDC drops, bulk
exports, or third-party feeds into the same DataFrame shapes the operators
expect. JSON/CSV notes baked in:

- ``mode=FAILFAST`` by default: corrupt rows fail loudly rather than
  becoming silent NULLs mid-pipeline (override with ``permissive=True``
  to route bad rows into ``_corrupt_record`` instead);
- csv gets ``header`` + explicit timestamp format; json is line-delimited
  (the only splittable JSON layout — a single giant JSON array cannot be
  read in parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "json", "csv")


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str | None = None,
    permissive: bool = False,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt`` with an explicit ``schema`` (required for
    json/csv; optional for parquet, which is self-describing)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    if fmt != "parquet" and schema is None:
        raise ValueError(
            f"{fmt} reads require an explicit schema: inference costs a "
            "full extra pass and is non-deterministic across batches"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt in ("json", "csv"):
        reader = reader.option(
            "mode", "PERMISSIVE" if permissive else "FAILFAST"
        )
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)

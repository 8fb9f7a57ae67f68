"""File-format source/sink breadth: CSV, JSON-lines, and ORC alongside the
parquet default — one read/write interface, schema always enforced.

The reference's only source is a Postgres table (JDBC path, ``sources/
jdbc.py``) and its sink is Elasticsearch (``pipeline/es_sink.py``); an
engine users switch to also has to ingest whatever files they have. Rules
this module encodes:

- **Schema is never inferred on the read path.** CSV/JSON inference costs an
  extra full scan BEFORE the real job (fatal at 100 TB) and can silently
  mistype columns on skewed samples; callers pass the schema (or take it
  from an existing DataFrame via :func:`schema_of`).
- **Text formats are interchange, not storage.** CSV/JSON scans can't push
  predicates or prune columns server-side the way parquet/ORC row groups
  do — `convert_to_parquet` is the one-scan fix a pipeline should apply at
  the boundary.
- Timestamps round-trip through an explicit ``timestampFormat`` with
  microsecond precision so CSV/JSON don't truncate event times.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructField, StructType

FORMATS = ("parquet", "orc", "json", "csv")

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_READ_OPTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "timestampFormat": _TS_FMT, "nullValue": "\\N"},
    "json": {"timestampFormat": _TS_FMT},
    "parquet": {},
    "orc": {},
}

_WRITE_OPTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "timestampFormat": _TS_FMT, "nullValue": "\\N"},
    "json": {"timestampFormat": _TS_FMT},
    "parquet": {},
    "orc": {},
}


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str | None = None,
    permissive: bool = False,
    **options: str,
) -> DataFrame:
    """General-purpose reader: explicit ``schema`` required for text formats
    (json/csv), optional for self-describing parquet/orc.

    ``mode=FAILFAST`` by default: corrupt rows fail loudly rather than
    becoming silent NULLs mid-pipeline (``permissive=True`` routes bad rows
    into ``_corrupt_record`` instead). json is line-delimited — the only
    splittable JSON layout; a single giant JSON array cannot be read in
    parallel. Shares ``_READ_OPTS`` with :func:`read_table` (header, NULL
    token, microsecond timestampFormat) so both readers parse a
    ``write_table`` output identically."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    if fmt in ("json", "csv") and schema is None:
        raise ValueError(
            f"{fmt} reads require an explicit schema: inference costs a "
            "full extra pass and is non-deterministic across batches"
        )
    reader = spark.read.format(fmt).options(**_READ_OPTS[fmt])
    if schema is not None:
        reader = reader.schema(schema)
    if fmt in ("json", "csv"):
        reader = reader.option(
            "mode", "PERMISSIVE" if permissive else "FAILFAST"
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: StructType
) -> DataFrame:
    """Read ``path`` as ``fmt`` with an enforced schema (never inferred).

    Text formats read FAILFAST: a corrupt row aborts the job instead of
    becoming a silent NULL mid-pipeline — without this,
    ``convert_to_parquet`` would launder malformed text rows into parquet
    NULLs, the exact failure the module contract forbids."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected {FORMATS}")
    reader = spark.read.format(fmt).options(**_READ_OPTS[fmt])
    if fmt in ("json", "csv"):
        reader = reader.option("mode", "FAILFAST")
    # parquet/orc carry their own schema; enforcing the expected one anyway
    # turns silent drift into a loud analysis error
    return reader.schema(schema).load(path)


def write_table(df: DataFrame, path: str, fmt: str, mode: str = "error") -> None:
    """Write ``df`` to ``path`` as ``fmt``; partition layout is the caller's
    call (pass a pre-repartitioned frame)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected {FORMATS}")
    df.write.format(fmt).options(**_WRITE_OPTS[fmt]).mode(mode).save(path)


def convert_to_parquet(
    spark: SparkSession,
    src_path: str,
    fmt: str,
    schema: StructType,
    dest_path: str,
) -> DataFrame:
    """Boundary conversion: one scan of a text-format drop rewritten as
    parquet, returning the parquet-backed frame. All downstream reads then
    get column pruning, predicate pushdown, and row-group statistics."""
    read_table(spark, src_path, fmt, schema).write.parquet(dest_path)
    return spark.read.parquet(dest_path)


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str,
    quarantine_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE read split into (good, quarantined) frames — the ingest
    posture between FAILFAST (one bad row kills a 100 TB load) and silent
    PERMISSIVE (bad rows become NULLs nobody audits): parse errors land in
    ``_corrupt_record``, the good frame drops the audit column, and the
    quarantine frame carries ONLY the raw offending lines (plus the source
    file for triage). When ``quarantine_path`` is given the rejects are
    also appended there as text, so a re-run of the fixed parser can
    re-ingest exactly the quarantined lines.

    Caveat baked into the split: Spark only populates ``_corrupt_record``
    when the column is part of the read schema, so it is appended here —
    callers pass their LOGICAL schema. The split predicate is
    NULL-safety-correct: a legitimately all-NULL row is NOT quarantined
    (its ``_corrupt_record`` is NULL)."""
    from pyspark.sql.types import StringType

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    read_schema = StructType(
        [*schema.fields, StructField("_corrupt_record", StringType())]
    )
    from pyspark import StorageLevel

    # input_file_name() must be captured BELOW the persist boundary, i.e.
    # evaluated over the file scan itself: if it sat above the cache, the
    # first materialization (e.g. consuming the good frame) would pin cached
    # rows with no file provenance and every later quarantine read would see
    # source_file = '' — the triage column silently dies.
    df = (
        read_files(
            spark, path, fmt, schema=read_schema, permissive=True,
            columnNameOfCorruptRecord="_corrupt_record",
        )
        .withColumn("_source_file", F.input_file_name())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # the persist is REQUIRED, not an optimization: Spark refuses a query
    # that filters raw files on _corrupt_record alone
    # (queryFromRawFilesIncludeCorruptRecordColumnError) — the sanctioned
    # pattern is parse once, persist, then split; disk-spillable storage
    # keeps it viable for large loads (one materialized pass, two reads).
    # Release it with release_quarantine(good) (or df.unpersist()) once both
    # frames are consumed.
    good = df.where(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record", "_source_file"
    )
    bad = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line"),
        F.col("_source_file").alias("source_file"),
    )
    if quarantine_path is not None:
        bad.select("raw_line").write.mode("append").text(quarantine_path)
    _QUARANTINE_CACHE[good] = df
    _QUARANTINE_CACHE[bad] = df
    # GC backstop: Spark's CacheManager holds a STRONG reference to the
    # cached plan until unpersist() is called — dropping the returned
    # frames only clears the Python-side dict entries above, so without
    # this a service loop that never calls release_quarantine would
    # accumulate JVM cache blocks for the session's lifetime (ADVICE r6).
    # The shared holder unpersists only once BOTH frames are collected:
    # an early unpersist would break the bad frame outright (filtering raw
    # files on _corrupt_record without a cache is a query error, see
    # above), so per-frame finalizers must not fire independently.
    holder = _SharedUnpersist(df, 2)
    weakref.finalize(good, holder.dec)
    weakref.finalize(bad, holder.dec)
    return good, bad


class _SharedUnpersist:
    """Refcounted unpersist: ``dec()`` n times -> unpersist the frame."""

    def __init__(self, df: DataFrame, n: int) -> None:
        self._df: DataFrame | None = df
        self._n = n

    def dec(self) -> None:
        self._n -= 1
        if self._n <= 0 and self._df is not None:
            df, self._df = self._df, None
            try:
                df.unpersist()
            except Exception:  # session already stopped
                pass


# frame -> the persisted parse frame backing it, so callers can release the
# cache without holding the internal frame themselves (explicit release is
# still the right call in a loop — the GC backstop above only helps once
# the collector actually runs). Weak keys keep the driver-side dict from
# pinning every returned frame's plan forever.
_QUARANTINE_CACHE: "weakref.WeakKeyDictionary[DataFrame, DataFrame]" = (
    weakref.WeakKeyDictionary()
)


def release_quarantine(frame: DataFrame) -> bool:
    """Unpersist the cached parse behind a (good, bad) pair returned by
    :func:`read_with_quarantine`. Pass either frame of the pair; returns
    True when a cache entry was found and released."""
    df = _QUARANTINE_CACHE.pop(frame, None)
    if df is None:
        return False
    # drop the sibling alias pointing at the same cache
    for k in [k for k, v in _QUARANTINE_CACHE.items() if v is df]:
        _QUARANTINE_CACHE.pop(k, None)
    df.unpersist()
    return True

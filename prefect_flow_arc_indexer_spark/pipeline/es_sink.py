"""Elasticsearch sink configuration — the production write path standing
opposite the local :class:`~prefect_flow_arc_indexer_spark.pipeline.sinks.
VersionedSink` (reference data path: ``streaming_bulk`` upsert/delete at
``flows/main_flow.py:366-436``; bulk-tuning defaults at ``608-616``).

The environment ships no ES cluster and no ``elasticsearch-spark`` jar, so
everything here is buildable and unit-testable up to the writer-options
boundary; :func:`write_upserts` raises a clear error when the connector
class is absent instead of failing deep inside py4j.

Semantics mapped from the reference:

- upsert-by-id      -> ``es.write.operation=upsert`` + ``es.mapping.id``
- bulk chunk 500    -> ``es.batch.size.entries`` (reference es_chunk_size)
- request timeout   -> ``es.http.timeout`` (reference es_request_timeout 30s)
- per-doc retries   -> ``es.batch.write.retry.count`` (reference 10)
- deletes           -> the connector cannot mix ops in one write (SURVEY
  risk #4): :func:`apply_actions_batch` splits the action stream and applies
  upserts first, then deletes — safe under replay because both are
  idempotent by id, and a delete-then-recreate inside one batch is resolved
  upstream by the last-writer-wins dedup in ``streaming.jobs``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

ES_FORMAT = "org.elasticsearch.spark.sql"


@dataclass(frozen=True)
class EsSinkConfig:
    nodes: str  # host[:port][,host2...]
    id_column: str = "id"
    batch_entries: int = 500  # reference es_chunk_size
    timeout_s: int = 30  # reference es_request_timeout
    retries: int = 10  # reference es_max_retries
    extra_options: dict[str, str] = field(default_factory=dict)

    def writer_options(self, operation: str = "upsert") -> dict[str, str]:
        opts = {
            "es.nodes": self.nodes,
            "es.mapping.id": self.id_column,
            "es.write.operation": operation,
            "es.batch.size.entries": str(self.batch_entries),
            "es.http.timeout": f"{self.timeout_s}s",
            "es.batch.write.retry.count": str(self.retries),
            # bulk-load posture; refresh is restored at publish time by the
            # alias-swap step (reference flows/main_flow.py:187,546)
            "es.batch.write.refresh": "false",
        }
        opts.update(self.extra_options)
        return opts


def _connector_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.elasticsearch.spark.sql.DefaultSource"
        )
        return True
    except Exception:
        return False


def write_upserts(df: DataFrame, cfg: EsSinkConfig, index: str) -> None:
    """Bulk-upsert ``df`` into ``index`` (executors stream partitions to ES;
    no driver collect). Raises RuntimeError when the connector jar is absent
    (this test environment) — callers fall back to VersionedSink."""
    spark = df.sparkSession
    if not _connector_available(spark):
        raise RuntimeError(
            "elasticsearch-spark connector not on the classpath; add the "
            "org.elasticsearch:elasticsearch-spark-30 jar (production) or "
            "use pipeline.sinks.VersionedSink (local)"
        )
    writer = df.write.format(ES_FORMAT).mode("append")
    for k, v in cfg.writer_options("upsert").items():
        writer = writer.option(k, v)
    writer.save(index)


def apply_actions_batch(
    actions: DataFrame, cfg: EsSinkConfig, write=write_upserts
) -> dict[str, int]:
    """Two-phase apply of a doc-action DataFrame (_op_type index|delete,
    grouped per target ``_index``): upserts first, then deletes. Returns counts
    per phase. ``write`` is injectable so tests (and the local pipeline) can
    capture the per-phase frames without an ES cluster."""
    counts: dict[str, int] = {}
    for op in ("index", "delete"):
        subset = actions.where(F.col("_op_type") == op)
        for row in subset.select("_index").distinct().collect():
            idx = row["_index"]
            frame = subset.where(F.col("_index") == idx)
            write(frame, cfg, idx)
            counts[f"{op}:{idx}"] = frame.count()
    return counts

"""Observation metrics (SURVEY A7) and the custom Python DataSource."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators.actions import doc_actions
from prefect_flow_arc_indexer_spark.pipeline.metrics import (
    observe_actions,
    observe_rowcount,
)
from prefect_flow_arc_indexer_spark.sources.parquet import index_documents
from prefect_flow_arc_indexer_spark.sources.pyds import register_cdc_feed
from tests.conftest import SF_DIR


def test_observe_actions_counts_match_direct_counts(spark):
    actions = doc_actions(index_documents(spark, SF_DIR), timestamp=None)
    observed, obs = observe_actions(actions)
    total = observed.count()  # the action that materializes the metrics
    m = obs.get
    assert m["n_actions"] == total
    assert m["n_upserts"] == actions.where(F.col("_op_type") == "index").count()
    assert m["n_deletes"] == actions.where(F.col("_op_type") == "delete").count()
    assert m["n_upserts"] + m["n_deletes"] == m["n_actions"]
    assert m["n_errors"] == 0  # well-formed fixture: no NULL ids/payloads


def test_observe_actions_flags_malformed_rows(spark):
    bad = spark.createDataFrame(
        [
            ("a", None, "index", '{"v":1}'),   # NULL id
            ("a", "2", "index", None),          # upsert without payload
            ("a", "3", "delete", None),         # delete without payload: fine
            ("a", "4", "index", '{"v":4}'),
        ],
        "_index string, _id string, _op_type string, _source string",
    )
    observed, obs = observe_actions(bad)
    observed.count()
    assert obs.get["n_errors"] == 2


def test_observe_rowcount_skip_gate(spark):
    df = index_documents(spark, SF_DIR).where(F.col("index") == "no_such")
    observed, obs = observe_rowcount(df)
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["n_rows"] == 0  # T4 skip-empty gate, no extra count() job


def test_cdc_feed_deterministic_and_partitioned(spark):
    register_cdc_feed(spark)
    df = (
        spark.read.format("cdc_feed")
        .option("rows", 500)
        .option("partitions", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 500
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(
        tuple(r)
        for r in spark.read.format("cdc_feed")
        .option("rows", 500)
        .option("partitions", 8)
        .load()
        .collect()
    )
    assert a == b, "same options must generate identical data"
    # ids unique; tombstone mix present; schema usable downstream
    assert df.select("id").distinct().count() == 500
    deleted = df.where("is_deleted").count()
    assert 0 < deleted < 500
    actions = doc_actions(df, timestamp=None)
    assert actions.where(F.col("_op_type") == "delete").count() == deleted


def test_cdc_feed_uneven_partition_split(spark):
    register_cdc_feed(spark)
    df = (
        spark.read.format("cdc_feed")
        .option("rows", 10)
        .option("partitions", 3)
        .load()
    )
    assert df.count() == 10  # ceil-split must not duplicate or drop rows


def test_full_sync_from_python_datasource(spark, tmp_path):
    """Integration seam: the pipeline's full-sync driver consumes the
    custom Python DataSource exactly like any DataFrame source — the feed
    generates executor-side, actions route, generations publish, and
    counts reconcile per index."""
    from prefect_flow_arc_indexer_spark.pipeline.runner import full_sync
    from prefect_flow_arc_indexer_spark.pipeline.sinks import VersionedSink

    register_cdc_feed(spark)
    docs = (
        spark.read.format("cdc_feed")
        .option("rows", 300)
        .option("partitions", 4)
        .load()
    )
    sink = VersionedSink(str(tmp_path / "sink"))
    report = full_sync(spark, docs, sink)
    # every generated index publishes, counts reconcile, nothing rolls back
    assert sorted(report.indexes) == ["alpha", "beta", "gamma"]
    assert all(report.reconcile_ok.values())
    assert not report.rolled_back
    live_total = sum(report.written.values())
    want = docs.where(~F.col("is_deleted")).count()
    assert live_total == want
    # published aliases read back the same live documents
    read_back = sum(
        sink.read_alias(spark, idx).count() for idx in report.indexes
    )
    assert read_back == want


def test_cdc_feed_stream_drains_to_batch_equivalence(spark, tmp_path):
    """AvailableNow over the streaming reader must deliver EXACTLY the
    batch reader's rows (same schema, same values), across multiple
    micro-batches with offsets persisted in the checkpoint."""
    register_cdc_feed(spark)
    rows, parts = 250, 3
    batch = sorted(
        tuple(r)
        for r in spark.read.format("cdc_feed")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
        .collect()
    )
    q = (
        spark.readStream.format("cdc_feed")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
        .writeStream.format("memory")
        .queryName("cdc_feed_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM cdc_feed_stream_sink").collect()
    )
    assert got == batch
    assert len(got) == rows

"""Round-6 pipeline fixes (VERDICT r5 tasks 4/7/8 + ADVICE r5): the CLI
ES mirror end-to-end over a real REST stub (delta-only upserts + tombstone
deletes), one-pass publish guards, and the bucketed empty-generation marker.
"""

from __future__ import annotations

import http.server
import json
import threading
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.pipeline.sinks import VersionedSink
from prefect_flow_arc_indexer_spark.streaming.watermark import WatermarkStore


class _RecordingEs(http.server.BaseHTTPRequestHandler):
    """Minimal ES _bulk stand-in: records every NDJSON action it receives."""

    ops: list[tuple[str, str, str]] = []  # (op, index, id) — class-level

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        lines = [ln for ln in body.decode().splitlines() if ln.strip()]
        i = 0
        while i < len(lines):
            meta = json.loads(lines[i])
            op = next(iter(meta))
            type(self).ops.append(
                (op, meta[op]["_index"], meta[op]["_id"])
            )
            i += 2 if op == "index" else 1  # index meta is followed by a doc
        resp = json.dumps({"errors": False, "items": []}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):
        pass


@pytest.fixture()
def es_stub():
    _RecordingEs.ops = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _RecordingEs)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"127.0.0.1:{srv.server_address[1]}", _RecordingEs.ops
    srv.shutdown()


def _write_events(spark, path: str, rows: list[tuple[str, int, str, datetime]]):
    """events.parquet rows (event_type, event_id, props, ts); tombstones are
    derived by index_documents as event_id % 13 == 0."""
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, props string, ts timestamp"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_cli_es_mirror_e2e_full_then_incremental(spark, tmp_path, capsys, es_stub):
    """Drive --sink-dir + --es-nodes together through a real REST stub:
    the full sync ships the alias and deletes source tombstones; the
    incremental run mirrors ONLY the merged delta (not the whole alias)
    and bulk-deletes the batch's tombstones (ADVICE r5 / VERDICT task 8)."""
    from prefect_flow_arc_indexer_spark.__main__ import main

    nodes, ops = es_stub
    src = str(tmp_path / "src")
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    _write_events(
        spark,
        f"{src}/events.parquet",
        [
            ("alpha", 1, '{"v": 1}', t0),
            ("alpha", 2, '{"v": 2}', t0),
            ("alpha", 3, '{"v": 3}', t0),
            ("alpha", 13, '{"v": 13}', t0),  # tombstone (13 % 13 == 0)
        ],
    )
    argv = [
        "--source", src,
        "--sink-dir", str(tmp_path / "sink"),
        "--es-nodes", nodes,
        "--or-ids", "alpha",
    ]
    assert main([*argv, "--full-sync"]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["written"]["alpha"] == 3
    assert sorted(o for o in ops if o[0] == "index") == [
        ("index", "alpha", "1"), ("index", "alpha", "2"),
        ("index", "alpha", "3"),
    ]
    assert ("delete", "alpha", "13") in ops

    # --- incremental: only the delta crosses the wire -----------------------
    ops.clear()
    _write_events(
        spark,
        f"{src}/events.parquet",
        [
            ("alpha", 1, '{"v": 1}', t0),       # unchanged, pre-watermark
            ("alpha", 2, '{"v": 2}', t0),
            ("alpha", 3, '{"v": 3}', t0),
            ("alpha", 4, '{"v": 4}', datetime(2030, 1, 1)),   # new upsert
            ("alpha", 26, '{"v": 26}', datetime(2030, 1, 1)), # new tombstone
        ],
    )
    assert main(argv) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["written"]["alpha"] == 2  # the CDC batch: ids 4 and 26
    upserted = sorted(o[2] for o in ops if o[0] == "index")
    deleted = sorted(o[2] for o in ops if o[0] == "delete")
    assert upserted == ["4"]       # ids 1-3 were NOT re-shipped
    assert deleted == ["26"]       # the tombstone reached ES
    # and the local alias agrees with what ES now holds
    sink = VersionedSink(str(tmp_path / "sink"))
    assert {r.id for r in sink.read_alias(spark, "alpha").collect()} == {
        "1", "2", "3", "4",
    }


# -- one-pass publish guards (ADVICE r5) --------------------------------------

DOCS_SCHEMA = (
    "`index` string, id string, document string, is_deleted boolean, "
    "updated_at string"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA).withColumn(
        "updated_at", F.col("updated_at").cast("timestamp")
    )


def test_one_pass_missing_stage_aborts_instead_of_empty_publish(spark, tmp_path):
    """An index name Spark partition-escapes ('a:b' stages as index=a%3Ab)
    makes the literal staged dir lookup miss; publishing anyway would commit
    an EMPTY generation over live data. The guard must raise and roll back
    (previously: published with reconcile_ok=False, silently)."""
    from prefect_flow_arc_indexer_spark.pipeline.runner import full_sync

    sink = VersionedSink(str(tmp_path / "sink"))
    docs = _docs(spark, [("a:b", "1", '{"v": 1}', False, "2024-01-01 00:00:00")])
    with pytest.raises(RuntimeError, match="one-pass (stage|audit)"):
        full_sync(
            spark, docs, sink, now=datetime(2024, 2, 1), one_pass=True
        )
    # nothing was published for the index
    assert "a:b" not in sink.read_manifest()


def test_one_pass_all_tombstone_bucketed_keeps_bucket_marker(spark, tmp_path):
    """An all-tombstone index under bucketed one-pass must publish its empty
    generation IN the bucketed layout — otherwise the index silently falls
    back to O(corpus) full-rewrite merges forever (ADVICE r5)."""
    from prefect_flow_arc_indexer_spark.pipeline.bucketed import bucket_count
    from prefect_flow_arc_indexer_spark.pipeline.runner import full_sync

    sink = VersionedSink(str(tmp_path / "sink"))
    docs = _docs(
        spark,
        [
            ("alpha", "1", '{"v": 1}', False, "2024-01-01 00:00:00"),
            ("ghost", "9", '{"v": 9}', True, "2024-01-01 00:00:00"),
        ],
    )
    report = full_sync(
        spark, docs, sink, now=datetime(2024, 2, 1),
        one_pass=True, bucketed=True, n_buckets=4,
    )
    assert report.written == {"alpha": 1, "ghost": 0}
    manifest = sink.read_manifest()
    assert bucket_count(sink, manifest["ghost"]) == 4
    assert bucket_count(sink, manifest["alpha"]) == 4
    assert sink.read_alias(spark, "ghost").count() == 0

"""Round-5 pipeline fixes (ADVICE r4): bulk item-error detection, the
same-second generation-collision guard, rebuild written-count accounting,
and the CLI's ES mirror path."""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.pipeline.es_sink import (
    BulkItemError,
    EsSinkConfig,
    _check_bulk_response,
    write_adaptive,
    write_deletes,
)
from prefect_flow_arc_indexer_spark.pipeline.runner import (
    full_sync,
    incremental_sync,
)
from prefect_flow_arc_indexer_spark.pipeline.sinks import VersionedSink
from prefect_flow_arc_indexer_spark.streaming.watermark import WatermarkStore

from tests.test_pipeline import BASE_ROWS, _docs


@pytest.fixture()
def sink(tmp_path):
    return VersionedSink(str(tmp_path / "sink"))


# -- ES _bulk item errors ---------------------------------------------------


def test_bulk_body_errors_true_raises_with_first_item():
    body = json.dumps(
        {
            "errors": True,
            "items": [
                {"index": {"_id": "a", "status": 201}},
                {
                    "index": {
                        "_id": "b",
                        "status": 429,
                        "error": {"type": "es_rejected_execution_exception"},
                    }
                },
            ],
        }
    ).encode()
    with pytest.raises(BulkItemError, match="es_rejected_execution"):
        _check_bulk_response(body)


def test_bulk_body_ok_and_non_json_pass():
    _check_bulk_response(b'{"errors": false, "items": []}')
    _check_bulk_response(b"")  # proxies may return empty 200 bodies
    _check_bulk_response(b"not json")


def test_item_rejections_trigger_adaptive_shrink(spark):
    """HTTP 200 + errors:true must reach write_adaptive as a failure so the
    backpressure step-down fires — previously rejected docs were silently
    dropped."""
    attempts: list[int] = []

    def flaky_write(df, cfg, index):
        attempts.append(cfg.batch_entries)
        if len(attempts) < 3:
            raise BulkItemError("bulk response reported item failures")

    cfg = EsSinkConfig(nodes="example:9200", batch_entries=120)
    df = spark.range(5)
    out = write_adaptive(df, cfg, "idx", write=flaky_write, sleep=lambda s: None)
    assert attempts == [120, 70, 20]  # -50 then -50 (the reference schedule)
    assert out.batch_entries == 20


def test_rest_path_raises_on_item_rejections_over_http(spark):
    """End to end over a real HTTP listener: a 200 response whose body says
    errors:true makes the executor task (and the job) fail instead of
    silently dropping the rejected ids."""
    import http.server
    import threading

    class Rejecting(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers["Content-Length"]))
            resp = json.dumps(
                {
                    "errors": True,
                    "items": [
                        {
                            "delete": {
                                "_id": "d0",
                                "status": 429,
                                "error": {
                                    "type": "es_rejected_execution_exception"
                                },
                            }
                        }
                    ],
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Rejecting)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        # retries=0: this test asserts the FAILURE surface; the in-place
        # 429 retry schedule has its own tests (test_round6_pipeline)
        cfg = EsSinkConfig(
            nodes=f"127.0.0.1:{srv.server_address[1]}", id_column="_id",
            retries=0,
        )
        df = spark.createDataFrame([("d0",), ("d1",)], "_id string").coalesce(1)
        with pytest.raises(Exception, match="item failures"):
            write_deletes(df, cfg, "idx_http")
    finally:
        srv.shutdown()


# -- same-second generation collision guard ---------------------------------


def test_incremental_same_second_as_publish_keeps_live_data(spark, sink, tmp_path):
    """Publish then incremental-sync within the SAME second: without the
    guard, write_generation(mode=overwrite) clobbers the directory the lazy
    merge plan reads from. The guard bumps the generation timestamp."""
    t = datetime(2024, 2, 1, 12, 0, 0)
    full_sync(spark, _docs(spark, BASE_ROWS), sink, now=t)
    published = sink.read_manifest()["alpha"]

    wm = WatermarkStore(str(tmp_path / "wm.json"))
    wm.set("default", datetime(2024, 1, 2))  # row id=2 onward counts as changed
    report = incremental_sync(
        spark, _docs(spark, BASE_ROWS), sink, wm, now=t  # same second!
    )
    assert report.written["alpha"] > 0
    new_gen = sink.read_manifest()["alpha"]
    assert new_gen != published  # name collision avoided by the bump
    # the merge read intact pre-publish data: live set is still exactly 1,2
    assert {r.id for r in sink.read_alias(spark, "alpha").collect()} == {"1", "2"}


# -- rebuild written-count accounting ---------------------------------------


def test_missing_alias_rebuild_reports_live_count(spark, sink, tmp_path):
    """A forced rebuild writes the FULL live set; report.written must say so
    (not the CDC batch count), consistent with full_sync."""
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    wm.set("default", datetime(2024, 1, 2))  # 1 changed alpha row (id=2)
    report = incremental_sync(
        spark,
        _docs(spark, BASE_ROWS),
        sink,  # no alias published yet -> rebuild path
        wm,
        or_ids=["alpha"],
        now=datetime(2024, 3, 1),
    )
    # alpha live set is ids {1, 2}; the old accounting reported 1
    assert report.written["alpha"] == 2


# -- CLI ES mirror path ------------------------------------------------------


def test_cli_es_nodes_mirrors_published_indexes(tmp_path, capsys, monkeypatch):
    import prefect_flow_arc_indexer_spark.pipeline.es_sink as es_sink
    from prefect_flow_arc_indexer_spark.__main__ import main

    calls: list[tuple[str, int, int, int, int]] = []
    delete_calls: list[tuple[str, int]] = []

    def fake_mirror(df, cfg, index, source_column="_source"):
        calls.append(
            (
                index,
                df.count(),
                cfg.batch_entries,
                cfg.timeout_s,
                cfg.retries,
            )
        )

    def fake_deletes(df, cfg, index):
        delete_calls.append((index, df.count()))

    swaps: list[tuple[str, str]] = []
    monkeypatch.setattr(es_sink, "write_upserts_rest", fake_mirror)
    monkeypatch.setattr(es_sink, "write_deletes", fake_deletes)
    monkeypatch.setattr(
        es_sink, "swap_alias", lambda cfg, a, g: swaps.append((a, g))
    )
    rc = main(
        [
            "--source", "/root/testdata/sf0.001",
            "--sink-dir", str(tmp_path / "sink"),
            "--full-sync",
            "--or-ids", "purchase",
            "--es-nodes", "example:9200",
            "--es-chunk-size", "123",
            "--es-timeout", "7",
            "--es-retries", "2",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the full-sync bulk load targets the generation-named physical index
    # and the alias is swapped to it afterwards (VERDICT r8 task 4)
    assert len(calls) == 1 and calls[0][0].startswith("purchase_")
    assert calls[0][1] == report["written"]["purchase"]
    assert calls[0][2:] == (123, 7, 2)  # flags reached EsSinkConfig
    assert swaps == [("purchase", calls[0][0])]
    assert report["mirror_published"] == {"purchase": calls[0][0]}
    # tombstone deletes are no longer shipped on full sync: the swap drops
    # the superseded physical index wholesale (they remain the incremental
    # path's job)
    assert delete_calls == []


# -- X3: concurrent submission of the large-index class ----------------------


def _three_index_rows():
    return BASE_ROWS + [
        ("gamma", "20", '{"v": 20}', False, "2024-01-01 00:00:00"),
        ("gamma", "21", '{"v": 21}', False, "2024-01-01 00:00:00"),
        ("gamma", "22", '{"v": 22}', False, "2024-01-01 00:00:00"),
    ]


def test_parallel_large_runs_both_pools_concurrently(spark, sink, monkeypatch):
    """full_sync(parallel_large=True): the two pg-indexer-large indexes are
    submitted from concurrent driver threads (reference
    run_large_indexer_parallel). A 2-party barrier inside write_generation
    proves overlap — if submission were sequential the first writer would
    time out waiting for the second."""
    import threading

    barrier = threading.Barrier(2)
    seen: list[tuple[str, str | None]] = []
    orig = sink.write_generation

    def barrier_write(df, alias, ts):
        pool = spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        seen.append((alias, pool))
        if pool == "pg-indexer-large":
            barrier.wait(timeout=60)  # both large writers must be in flight
        return orig(df, alias, ts)

    monkeypatch.setattr(sink, "write_generation", barrier_write)
    report = full_sync(
        spark,
        _docs(spark, _three_index_rows()),
        sink,
        now=datetime(2024, 2, 1),
        parallel_large=True,
    )
    # ascending size: beta(1) < alpha(2 live) < gamma(3) -> large = top 2
    assert report.indexes == ["beta", "alpha", "gamma"]
    assert report.pools == {
        "beta": "pg-indexer",
        "alpha": "pg-indexer-large",
        "gamma": "pg-indexer-large",
    }
    large_seen = {a: p for a, p in seen if p == "pg-indexer-large"}
    assert set(large_seen) == {"alpha", "gamma"}
    # SyncReport unchanged vs the sequential contract
    assert report.written == {"beta": 1, "alpha": 2, "gamma": 3}
    assert all(report.reconcile_ok.values())
    assert {r.id for r in sink.read_alias(spark, "gamma").collect()} == {
        "20", "21", "22"
    }


# -- one-pass full-sync data plane -------------------------------------------


def test_one_pass_full_sync_matches_sequential(spark, tmp_path):
    docs = _docs(spark, _three_index_rows())
    seq = VersionedSink(str(tmp_path / "seq"))
    one = VersionedSink(str(tmp_path / "one"))
    t = datetime(2024, 2, 1)
    r_seq = full_sync(spark, docs, seq, now=t)
    r_one = full_sync(spark, docs, one, now=t, one_pass=True)
    assert r_one.indexes == r_seq.indexes
    assert r_one.written == r_seq.written
    assert r_one.reconcile_ok == r_seq.reconcile_ok
    assert r_one.pools == r_seq.pools
    for idx in r_seq.indexes:
        assert sorted(
            (r.id, r.document)
            for r in one.read_alias(spark, idx).collect()
        ) == sorted(
            (r.id, r.document) for r in seq.read_alias(spark, idx).collect()
        )
    # staging directory cleaned up
    assert not [d for d in os.listdir(one.base_dir) if d.startswith("_stage")]


def test_one_pass_plan_scans_fact_table_once(spark, tmp_path):
    """The fused data plane is ONE FileScan: the per-index filter loop
    (O(#indexes) scans) is gone."""
    from prefect_flow_arc_indexer_spark.pipeline.runner import one_pass_live

    src = str(tmp_path / "docs_parquet")
    _docs(spark, _three_index_rows()).write.parquet(src)
    docs = spark.read.parquet(src)
    plan = (
        one_pass_live(docs, ["alpha", "beta", "gamma"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1


def test_one_pass_publishes_empty_generation_for_all_tombstone_index(
    spark, tmp_path
):
    rows = BASE_ROWS + [
        ("gamma", "30", '{"v": 30}', True, "2024-01-05 00:00:00"),
    ]
    one = VersionedSink(str(tmp_path / "one"))
    report = full_sync(
        spark, _docs(spark, rows), one, now=datetime(2024, 2, 1),
        one_pass=True,
    )
    assert report.written["gamma"] == 0
    assert report.reconcile_ok["gamma"] is True
    assert one.alias_exists("gamma")


def test_cli_one_pass_bucketed_flags(tmp_path, capsys):
    """The round-5 sync modes are reachable from the CLI: --one-pass lays
    down --bucketed generations through the single-scan data plane."""
    import json as _json

    from prefect_flow_arc_indexer_spark.__main__ import main
    from prefect_flow_arc_indexer_spark.pipeline.bucketed import bucket_count

    sink_dir = str(tmp_path / "cli_sink")
    rc = main(
        [
            "--source", "/root/testdata/sf0.001",
            "--sink-dir", sink_dir,
            "--full-sync",
            "--one-pass",
            "--bucketed",
            "--n-buckets", "4",
        ]
    )
    assert rc == 0
    report = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["written"] and all(report["reconcile_ok"].values())
    sink = VersionedSink(sink_dir)
    for idx, gen in sink.read_manifest().items():
        assert bucket_count(sink, gen) == 4, idx


def test_fair_scheduler_confs_point_at_valid_pool_file():
    """X3 pools must be REAL scheduling, not labels: the conf helper turns
    on FAIR mode with an allocation file declaring exactly the pool names
    the runner assigns."""
    import xml.etree.ElementTree as ET

    from prefect_flow_arc_indexer_spark.pipeline.runner import (
        POOL_DEFAULT,
        POOL_LARGE,
    )
    from prefect_flow_arc_indexer_spark.session import fair_scheduler_confs

    confs = fair_scheduler_confs()
    assert confs["spark.scheduler.mode"] == "FAIR"
    path = confs["spark.scheduler.allocation.file"]
    assert os.path.isfile(path)
    pools = {
        p.get("name"): {c.tag: c.text for c in p}
        for p in ET.parse(path).getroot().findall("pool")
    }
    assert set(pools) == {POOL_DEFAULT, POOL_LARGE}
    # the large class outweighs the default one
    assert int(pools[POOL_LARGE]["weight"]) > int(pools[POOL_DEFAULT]["weight"])

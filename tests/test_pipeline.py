"""Pipeline semantics: versioned sink, atomic publish, rollback, orphan
cleanup, full/incremental sync, watermark round trip (SURVEY §2.6/§2.7)."""

from __future__ import annotations

import json
import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.pipeline.runner import (
    SyncReport,
    full_sync,
    incremental_sync,
)
from prefect_flow_arc_indexer_spark.pipeline.sinks import VersionedSink
from prefect_flow_arc_indexer_spark.streaming.watermark import WatermarkStore

DOCS_SCHEMA = (
    "`index` string, id string, document string, is_deleted boolean, "
    "updated_at string"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA).withColumn(
        "updated_at", F.col("updated_at").cast("timestamp")
    )


BASE_ROWS = [
    ("alpha", "1", '{"v": 1}', False, "2024-01-01 00:00:00"),
    ("alpha", "2", '{"v": 2}', False, "2024-01-02 00:00:00"),
    ("alpha", "3", '{"v": 3}', True, "2024-01-03 00:00:00"),
    ("beta", "10", '{"v": 10}', False, "2024-01-01 12:00:00"),
]


@pytest.fixture()
def sink(tmp_path):
    return VersionedSink(str(tmp_path / "sink"))


def test_full_sync_excludes_tombstones_and_publishes(spark, sink):
    report = full_sync(
        spark, _docs(spark, BASE_ROWS), sink, now=datetime(2024, 2, 1)
    )
    # smallest-first ordering: beta(1) before alpha(2 live + 1 tombstone)
    assert report.indexes == ["beta", "alpha"]
    assert report.written == {"beta": 1, "alpha": 2}
    assert report.reconcile_ok == {"alpha": True, "beta": True}
    alpha = sink.read_alias(spark, "alpha")
    assert {r.id for r in alpha.collect()} == {"1", "2"}


def test_publish_is_atomic_manifest_swap(spark, sink, tmp_path):
    full_sync(spark, _docs(spark, BASE_ROWS), sink, now=datetime(2024, 2, 1))
    manifest = sink.read_manifest()
    assert manifest["alpha"] == "alpha_2024-02-01t00.00.00"
    # no temp files left behind by the atomic replace
    leftovers = [f for f in os.listdir(sink.base_dir) if f.endswith(".tmp")]
    assert leftovers == []


def test_full_sync_replaces_old_generation(spark, sink):
    full_sync(spark, _docs(spark, BASE_ROWS), sink, now=datetime(2024, 2, 1))
    full_sync(spark, _docs(spark, BASE_ROWS), sink, now=datetime(2024, 2, 2))
    gens = sink.list_generations()
    assert "alpha_2024-02-02t00.00.00" in gens
    assert "alpha_2024-02-01t00.00.00" not in gens  # old generation dropped


def test_or_ids_pins_and_lowercases(spark, sink):
    report = full_sync(
        spark,
        _docs(spark, BASE_ROWS),
        sink,
        or_ids=["ALPHA"],
        now=datetime(2024, 2, 1),
    )
    assert report.indexes == ["alpha"]
    assert not sink.alias_exists("beta")


def test_cleanup_orphans_spares_published(spark, sink):
    full_sync(spark, _docs(spark, BASE_ROWS), sink, now=datetime(2024, 2, 1))
    os.makedirs(os.path.join(sink.base_dir, "legacy_2023-01-01t00.00.00"))
    report = full_sync(spark, _docs(spark, BASE_ROWS), sink, now=datetime(2024, 2, 2))
    assert report.dropped_orphans == ["legacy_2023-01-01t00.00.00"]
    assert sink.alias_exists("alpha")


def test_incremental_merge_upsert_and_delete(spark, sink, tmp_path):
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    full_sync(spark, _docs(spark, BASE_ROWS), sink, now=datetime(2024, 2, 1))
    wm.set("default", datetime(2024, 1, 10))
    changed = BASE_ROWS + [
        ("alpha", "2", '{"v": 22}', False, "2024-01-15 00:00:00"),  # update
        ("alpha", "1", "{}", True, "2024-01-16 00:00:00"),  # tombstone
        ("alpha", "4", '{"v": 4}', False, "2024-01-17 00:00:00"),  # insert
    ]
    report = incremental_sync(
        spark,
        _docs(spark, changed),
        sink,
        wm,
        now=datetime(2024, 2, 2),
    )
    state = {r.id: r.document for r in sink.read_alias(spark, "alpha").collect()}
    assert state == {"2": '{"v": 22}', "4": '{"v": 4}'}
    assert "beta" in report.skipped  # nothing past the watermark
    assert wm.get("default") == datetime(2024, 2, 2)


def test_incremental_watermark_is_inclusive(spark, sink, tmp_path):
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    full_sync(spark, _docs(spark, BASE_ROWS), sink, now=datetime(2024, 2, 1))
    # watermark exactly at alpha/2's updated_at: row must re-deliver (T2)
    wm.set("default", datetime(2024, 1, 2))
    report = incremental_sync(
        spark, _docs(spark, BASE_ROWS), sink, wm, now=datetime(2024, 2, 2)
    )
    assert report.written["alpha"] >= 1


def test_incremental_requires_seeded_watermark(spark, sink, tmp_path):
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    with pytest.raises(ValueError, match="no watermark"):
        incremental_sync(spark, _docs(spark, BASE_ROWS), sink, wm)


def test_rollback_drops_partial_generation(spark, sink, monkeypatch):
    docs = _docs(spark, BASE_ROWS)
    original_publish = VersionedSink.publish
    calls = {"n": 0}

    def failing_publish(self, alias, generation, drop_old=True):
        calls["n"] += 1
        if calls["n"] == 2:  # fail on the second index (alpha)
            raise RuntimeError("simulated publish failure")
        return original_publish(self, alias, generation, drop_old)

    monkeypatch.setattr(VersionedSink, "publish", failing_publish)
    with pytest.raises(RuntimeError, match="simulated"):
        full_sync(spark, docs, sink, now=datetime(2024, 2, 1))
    monkeypatch.setattr(VersionedSink, "publish", original_publish)
    # beta (first, smallest) published; alpha's partial generation removed
    assert sink.alias_exists("beta")
    assert not sink.alias_exists("alpha")
    assert all("alpha" not in g for g in sink.list_generations())


def test_watermark_store_roundtrip(tmp_path):
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    assert wm.get("p") is None
    t = datetime(2024, 3, 1, 12, 30, 45, 123456)
    wm.set("p", t)
    assert wm.get("p") == t
    # file is valid JSON (atomic replace completed)
    assert json.load(open(tmp_path / "wm.json"))["p"].startswith("2024-03-01")


def test_es_sink_writer_options_and_two_phase(spark):
    """ES sink maps the reference's bulk-tuning defaults onto connector
    options, and the action apply is two-phase: all upserts before any
    delete, grouped per target index."""
    from prefect_flow_arc_indexer_spark.pipeline.es_sink import (
        EsSinkConfig,
        apply_actions_batch,
        write_upserts,
    )

    cfg = EsSinkConfig(nodes="es:9200", id_column="_id")
    opts = cfg.writer_options()
    assert opts["es.write.operation"] == "upsert"
    assert opts["es.batch.size.entries"] == "500"  # reference es_chunk_size
    assert opts["es.http.timeout"] == "30s"
    assert opts["es.batch.write.retry.count"] == "10"

    actions = spark.createDataFrame(
        [
            ("idx_a", "1", "index", '{"v":1}'),
            ("idx_a", "2", "delete", None),
            ("idx_b", "3", "index", '{"v":3}'),
        ],
        "_index string, _id string, _op_type string, _source string",
    )
    upsert_calls, delete_calls = [], []
    order = []
    apply_actions_batch(
        actions,
        cfg,
        write=lambda df, c, idx: (
            upsert_calls.append((idx, sorted(r["_id"] for r in df.collect()))),
            order.append("index"),
        ),
        write_delete=lambda df, c, idx: (
            delete_calls.append((idx, sorted(r["_id"] for r in df.collect()))),
            order.append("delete"),
        ),
    )
    # deletes go through the DELETE writer only — never the upsert path
    # (the ES connector has no delete op), and strictly after all upserts
    assert upsert_calls == [("idx_a", ["1"]), ("idx_b", ["3"])] or sorted(
        upsert_calls
    ) == [("idx_a", ["1"]), ("idx_b", ["3"])]
    assert delete_calls == [("idx_a", ["2"])]
    assert order.index("delete") == len(order) - 1

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="connector"):
        write_upserts(actions, cfg, "idx_a")


def test_es_sink_rest_delete_bulk_bodies(spark, tmp_path):
    """write_deletes ships NDJSON delete actions over the injectable bulk
    transport — executor-side, chunked by cfg.batch_entries, and never
    touches the upsert connector options. The fake transport persists each
    POST to disk because foreachPartition closures run in Python worker
    processes, not the driver."""
    import json as _json

    from prefect_flow_arc_indexer_spark.pipeline.es_sink import (
        EsSinkConfig,
        write_deletes,
    )

    cfg = EsSinkConfig(nodes="es:9200", id_column="_id", batch_entries=2)
    ids = [(f"d{i}",) for i in range(5)]
    df = spark.createDataFrame(ids, "_id string").coalesce(1)

    cap_dir = tmp_path / "bulk"
    cap_dir.mkdir()
    cap = str(cap_dir)

    def fake_post(url, body, timeout_s):
        import os
        import uuid

        with open(os.path.join(cap, uuid.uuid4().hex + ".json"), "w") as f:
            _json.dump(
                {"url": url, "body": body.decode(), "timeout": timeout_s}, f
            )
        return 200

    write_deletes(df, cfg, "idx_live", post=fake_post)
    posts = [
        _json.load(open(p)) for p in sorted(cap_dir.glob("*.json"))
    ]
    assert posts, "no bulk bodies shipped"
    assert all(p["url"] == "http://es:9200/_bulk" for p in posts)
    assert all(p["timeout"] == 30 for p in posts)
    lines = [
        _json.loads(line)
        for p in posts
        for line in p["body"].strip().split("\n")
    ]
    assert sorted(a["delete"]["_id"] for a in lines) == [
        "d0", "d1", "d2", "d3", "d4",
    ]
    assert all(a["delete"]["_index"] == "idx_live" for a in lines)
    # chunking respected: no body carries more than batch_entries actions
    assert max(len(p["body"].strip().split("\n")) for p in posts) <= 2


def test_schema_drift_forces_full_rebuild(spark, sink, tmp_path):
    """T7 (reference flows/main_flow.py:62-86,674-693): when the sink's
    stored schema_maintainer.schema_name diverges from the source's current
    value, the incremental path must fully rebuild that index — not merge —
    and flip the alias to the new generation."""
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    v1 = [
        ("alpha", "1", '{"schema_maintainer": {"schema_name": "Org A"}, "v": 1}',
         False, "2024-01-01 00:00:00"),
        ("alpha", "2", '{"schema_maintainer": {"schema_name": "Org A"}, "v": 2}',
         False, "2024-01-02 00:00:00"),
        ("alpha", "9", '{"schema_maintainer": {"schema_name": "Org A"}}',
         False, "2024-01-02 00:00:00"),
    ]
    full_sync(spark, _docs(spark, v1), sink, now=datetime(2024, 2, 1))
    wm.set("default", datetime(2024, 1, 10))
    # the org renamed: every doc now carries the new schema_name, but only
    # doc 2 is past the watermark — a plain merge would leave 1 and 9 stale
    v2 = [
        ("alpha", "1", '{"schema_maintainer": {"schema_name": "Org B"}, "v": 1}',
         False, "2024-01-01 00:00:00"),
        ("alpha", "2", '{"schema_maintainer": {"schema_name": "Org B"}, "v": 22}',
         False, "2024-01-15 00:00:00"),
        ("alpha", "9", '{"schema_maintainer": {"schema_name": "Org B"}}',
         False, "2024-01-02 00:00:00"),
    ]
    report = incremental_sync(
        spark, _docs(spark, v2), sink, wm, now=datetime(2024, 2, 2)
    )
    assert report.rebuilt == ["alpha"]
    state = {r.id: r.document for r in sink.read_alias(spark, "alpha").collect()}
    assert len(state) == 3
    assert all('"Org B"' in doc for doc in state.values())  # no stale docs
    # alias points at the rebuilt generation, old generation dropped
    assert sink.read_manifest()["alpha"] == "alpha_2024-02-02t00.00.00"


def test_schema_stable_keeps_merge_path(spark, sink, tmp_path):
    """T7 negative: same schema_name on both sides -> normal CDC merge."""
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    rows = [
        ("alpha", "1", '{"schema_maintainer": {"schema_name": "Org A"}, "v": 1}',
         False, "2024-01-01 00:00:00"),
        ("alpha", "2", '{"schema_maintainer": {"schema_name": "Org A"}, "v": 2}',
         False, "2024-01-15 00:00:00"),
    ]
    full_sync(spark, _docs(spark, rows), sink, now=datetime(2024, 2, 1))
    wm.set("default", datetime(2024, 1, 10))
    report = incremental_sync(
        spark, _docs(spark, rows), sink, wm, now=datetime(2024, 2, 2)
    )
    assert report.rebuilt == []
    assert report.written == {"alpha": 1}


def test_flow_level_retries_then_success(spark, sink, monkeypatch):
    """X4 (reference flows/main_flow.py:722-723): a transient sink failure
    retries after the delay instead of aborting the run; the failed
    attempt's generation is rolled back before the retry."""
    calls = {"n": 0}
    slept = []
    original = VersionedSink.publish

    def flaky_publish(self, alias, generation, drop_old=True):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient sink failure")
        return original(self, alias, generation, drop_old)

    monkeypatch.setattr(VersionedSink, "publish", flaky_publish)
    report = full_sync(
        spark,
        _docs(spark, BASE_ROWS),
        sink,
        now=datetime(2024, 2, 1),
        retries=2,
        retry_delay_s=500.0,
        sleep=slept.append,
    )
    monkeypatch.setattr(VersionedSink, "publish", original)
    assert slept == [500.0]
    assert report.retried == {"beta": 1}  # beta (smallest) hit the failure
    assert report.rolled_back == []
    assert sink.alias_exists("beta") and sink.alias_exists("alpha")


def test_flow_level_retries_exhaust_and_rollback(spark, sink, monkeypatch):
    """X4 + X5: after exhausting retries the run aborts, the half-written
    generation is gone, and the index is recorded as rolled back."""
    def always_fail(self, alias, generation, drop_old=True):
        raise RuntimeError("persistent sink failure")

    monkeypatch.setattr(VersionedSink, "publish", always_fail)
    slept = []
    with pytest.raises(RuntimeError, match="persistent"):
        full_sync(
            spark,
            _docs(spark, BASE_ROWS),
            sink,
            now=datetime(2024, 2, 1),
            retries=2,
            retry_delay_s=1.0,
            sleep=slept.append,
        )
    assert slept == [1.0, 1.0]  # 1 initial + 2 retries -> 2 sleeps
    assert sink.list_generations() == []  # every attempt rolled back


def test_scheduler_pool_tags_top2_large(spark, sink, monkeypatch):
    """X3 (reference flows/main_flow.py:685-687,721): the two largest
    indexes run under the pg-indexer-large scheduler pool; the local
    property is live while their jobs execute and cleared afterwards."""
    rows = BASE_ROWS + [
        ("gamma", "20", '{"v": 20}', False, "2024-01-01 00:00:00"),
        ("gamma", "21", '{"v": 21}', False, "2024-01-01 00:00:00"),
        ("gamma", "22", '{"v": 22}', False, "2024-01-01 00:00:00"),
    ]
    seen_pools = {}
    original = VersionedSink.write_generation

    def spying_write(self, df, alias, timestamp):
        seen_pools[alias] = df.sparkSession.sparkContext.getLocalProperty(
            "spark.scheduler.pool"
        )
        return original(self, df, alias, timestamp)

    monkeypatch.setattr(VersionedSink, "write_generation", spying_write)
    report = full_sync(spark, _docs(spark, rows), sink, now=datetime(2024, 2, 1))
    # sizes: beta=1 < alpha=2 < gamma=3 -> alpha+gamma are the top 2
    assert report.pools == {
        "beta": "pg-indexer",
        "alpha": "pg-indexer-large",
        "gamma": "pg-indexer-large",
    }
    assert seen_pools == report.pools  # property was live during each write
    assert (
        spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None
    )


def test_adaptive_bulk_shrink_steps_down(spark):
    """T6 (reference flows/main_flow.py:439-451): on bulk failure the chunk
    size steps down 500 -> 450 -> ... (-50 while >50, -10 while >10, -1)
    with a sleep between attempts, and the adapted config is returned."""
    from prefect_flow_arc_indexer_spark.pipeline.es_sink import (
        EsSinkConfig,
        shrink_chunk,
        write_adaptive,
    )

    # the exact reference step schedule
    sizes = [500]
    while sizes[-1] > 1:
        sizes.append(shrink_chunk(sizes[-1]))
    assert sizes[:3] == [500, 450, 400]
    assert sizes[-6:] == [50, 40, 30, 20, 10, 9] or 1 in sizes
    assert sizes[-1] == 1 and all(a > b for a, b in zip(sizes, sizes[1:]))

    df = spark.createDataFrame([("1",)], "_id string")
    attempts, slept = [], []

    def flaky_write(frame, cfg, index):
        attempts.append(cfg.batch_entries)
        if cfg.batch_entries > 400:  # ES times out on big bulks
            raise TimeoutError("bulk timeout")

    cfg = EsSinkConfig(nodes="es:9200", id_column="_id")
    adapted = write_adaptive(
        df, cfg, "idx", write=flaky_write, backoff_s=120.0, sleep=slept.append
    )
    assert attempts == [500, 450, 400]
    assert slept == [120.0, 120.0]
    assert adapted.batch_entries == 400  # caller keeps the adapted size

    def always_fail(frame, cfg, index):
        raise TimeoutError("down hard")

    with pytest.raises(TimeoutError):
        write_adaptive(
            df,
            EsSinkConfig(nodes="es:9200", batch_entries=2),
            "idx",
            write=always_fail,
            sleep=slept.append,
        )


def test_read_files_formats_agree(spark, tmp_path):
    """The same table staged as parquet/json/csv reads back identically
    through the unified reader (explicit schema, FAILFAST)."""
    from prefect_flow_arc_indexer_spark.sources.files import read_files
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    schema = nation.schema
    staged = {}
    for fmt in ("parquet", "json", "csv"):
        p = str(tmp_path / f"nation_{fmt}")
        nation.write.format(fmt).option("header", "true").save(p)
        staged[fmt] = p
    base = sorted(map(tuple, nation.collect()))
    for fmt, p in staged.items():
        got = sorted(
            map(tuple, read_files(spark, p, fmt, schema=schema).collect())
        )
        assert got == base, fmt

    import pytest as _pytest

    with _pytest.raises(ValueError, match="explicit schema"):
        read_files(spark, staged["json"], "json")


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Same-bucketed tables joined on the bucket key must plan with zero
    ShuffleExchange operators (the write-time shuffle replaces every
    join-time shuffle), and produce the same rows as the plain join."""
    from prefect_flow_arc_indexer_spark.pipeline.bucketing import (
        bucketed_join,
        write_bucketed,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    cust = load_table(spark, "/root/testdata/sf0.001", "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, "t_orders_b", "o_custkey", 8)
        write_bucketed(cust, "t_cust_b", "o_custkey", 8)
        joined = bucketed_join(spark, "t_orders_b", "t_cust_b", "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        got = joined.count()
        want = orders.join(cust, "o_custkey").count()
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_cli_full_then_incremental_roundtrip(spark, tmp_path, capsys):
    """The __main__ CLI mirrors the reference's flow parameters: a full
    sync publishes every index and seeds the watermark (the reference's
    save_last_run_config hook), and the follow-up incremental run (the
    reference's default mode) reads that watermark instead of failing."""
    import json as _json

    from prefect_flow_arc_indexer_spark.__main__ import main

    sink_dir = str(tmp_path / "cli_sink")
    rc = main(
        [
            "--source", "/root/testdata/sf0.001",
            "--sink-dir", sink_dir,
            "--full-sync",
        ]
    )
    assert rc == 0
    full = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert full["indexes"] and full["written"]
    assert all(full["reconcile_ok"].values())

    rc = main(["--source", "/root/testdata/sf0.001", "--sink-dir", sink_dir])
    assert rc == 0
    inc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # nothing changed since the full sync's watermark -> all skipped
    assert sorted(inc["skipped"]) == sorted(full["indexes"])

    # or_ids pinning + lowercase (reference or_ids_to_run)
    rc = main(
        [
            "--source", "/root/testdata/sf0.001",
            "--sink-dir", str(tmp_path / "pin_sink"),
            "--full-sync",
            "--or-ids", "PURCHASE",
        ]
    )
    assert rc == 0
    pinned = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pinned["indexes"] == ["purchase"]


def test_sink_compaction_reduces_files_and_preserves_rows(spark, sink):
    """compact() rewrites a many-file generation into the byte-targeted
    file count, reconciles rows before the atomic flip, and drops the old
    generation — readers only ever see a complete generation."""
    rows = [("alpha", str(i), '{"v": %d}' % i, False, "2024-01-01 00:00:00")
            for i in range(200)]
    docs = _docs(spark, rows).repartition(16)
    full_sync(spark, docs, sink, now=datetime(2024, 2, 1))
    old_gen = sink.read_manifest()["alpha"]
    old_files = [
        f for f in os.listdir(sink.generation_path(old_gen))
        if f.endswith(".parquet")
    ]
    assert len(old_files) > 4  # fragmented by the shuffle parallelism

    gen = sink.compact(
        spark, "alpha", target_bytes=10**9, now=datetime(2024, 2, 2)
    )
    assert sink.read_manifest()["alpha"] == gen
    new_dir = sink.generation_path(gen)
    new_files = [f for f in os.listdir(new_dir) if f.endswith(".parquet")]
    assert len(new_files) == 1  # everything fits one 1GB target file
    assert sink.read_alias(spark, "alpha").count() == 200
    assert old_gen not in sink.list_generations()

    # same-second re-compaction must not clobber the generation it reads
    gen2 = sink.compact(
        spark, "alpha", target_bytes=10**9, now=datetime(2024, 2, 2)
    )
    assert gen2 != gen
    assert sink.read_alias(spark, "alpha").count() == 200


def test_es_rest_delete_over_real_http(spark):
    """The REST bulk-delete path exercised over an actual HTTP listener
    (stdlib http.server playing ES): executors POST NDJSON to /_bulk,
    chunked by batch_entries, and the server sees every id exactly once.
    This covers the production transport up to the cluster boundary —
    URL shaping, content type, chunking, executor-side execution."""
    import http.server
    import json as _json
    import tempfile
    import threading

    from prefect_flow_arc_indexer_spark.pipeline.es_sink import (
        EsSinkConfig,
        write_deletes,
    )

    cap_dir = tempfile.mkdtemp(prefix="es_bulk_")

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            import os
            import uuid

            with open(os.path.join(cap_dir, uuid.uuid4().hex), "wb") as f:
                f.write(
                    _json.dumps(
                        {
                            "path": self.path,
                            "ctype": self.headers["Content-Type"],
                            "body": body.decode(),
                        }
                    ).encode()
                )
            resp = b'{"errors": false, "items": []}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cfg = EsSinkConfig(
            nodes=f"127.0.0.1:{port}", id_column="_id", batch_entries=3
        )
        df = spark.createDataFrame(
            [(f"d{i}",) for i in range(8)], "_id string"
        ).coalesce(2)
        write_deletes(df, cfg, "idx_http")  # default urllib transport
    finally:
        srv.shutdown()

    import os

    posts = [_json.load(open(os.path.join(cap_dir, p))) for p in os.listdir(cap_dir)]
    assert posts, "no HTTP bulk requests arrived"
    assert all(p["path"] == "/_bulk" for p in posts)
    assert all(p["ctype"] == "application/x-ndjson" for p in posts)
    actions = [
        _json.loads(line)
        for p in posts
        for line in p["body"].strip().split("\n")
    ]
    assert sorted(a["delete"]["_id"] for a in actions) == [
        f"d{i}" for i in range(8)
    ]
    assert all(a["delete"]["_index"] == "idx_http" for a in actions)
    assert max(len(p["body"].strip().split("\n")) for p in posts) <= 3


def test_apply_actions_batch_adaptive_carries_chunk_size(spark):
    """T6 end-to-end through the two-phase apply: a timeout on the first
    index shrinks the chunk and the SHRUNK size is used for every later
    index (the reference keeps the reduced es_chunk_size for the rest of
    the stream)."""
    from prefect_flow_arc_indexer_spark.pipeline.es_sink import (
        EsSinkConfig,
        apply_actions_batch,
    )

    actions = spark.createDataFrame(
        [
            ("idx_a", "1", "index", "{}"),
            ("idx_b", "2", "index", "{}"),
            ("idx_a", "3", "delete", None),
        ],
        "_index string, _id string, _op_type string, _source string",
    )
    seen = []
    fails = {"n": 0}

    def flaky(frame, cfg, idx):
        seen.append((idx, cfg.batch_entries))
        if cfg.batch_entries > 450 and fails["n"] == 0:
            fails["n"] += 1
            raise TimeoutError("bulk timeout")

    counts = apply_actions_batch(
        actions,
        EsSinkConfig(nodes="es:9200"),
        write=flaky,
        write_delete=flaky,
        adaptive=True,
        sleep=lambda s: None,
    )
    # first index: 500 fails -> retried at 450; remaining writes stay at 450
    assert seen[0][1] == 500 and seen[1][1] == 450
    assert all(c == 450 for _, c in seen[2:])
    assert counts["index:idx_a"] == 1 and counts["delete:idx_a"] == 1


def test_es_rest_upsert_over_real_http(spark):
    """The connector-less REST upsert path over a live HTTP listener:
    NDJSON {"index": meta}\\n{doc} pairs, chunked, every (_id, _source)
    delivered exactly once."""
    import http.server
    import json as _json
    import os
    import tempfile
    import threading
    import uuid

    from prefect_flow_arc_indexer_spark.pipeline.es_sink import (
        EsSinkConfig,
        write_upserts_rest,
    )

    cap_dir = tempfile.mkdtemp(prefix="es_upsert_")

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with open(os.path.join(cap_dir, uuid.uuid4().hex), "wb") as f:
                f.write(body)
            resp = b'{"errors": false, "items": []}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cfg = EsSinkConfig(
            nodes=f"127.0.0.1:{srv.server_address[1]}",
            id_column="_id",
            batch_entries=2,
        )
        df = spark.createDataFrame(
            [(str(i), '{"v": %d}' % i) for i in range(5)],
            "_id string, _source string",
        ).coalesce(1)
        write_upserts_rest(df, cfg, "idx_up")
    finally:
        srv.shutdown()

    lines = [
        ln
        for p in os.listdir(cap_dir)
        for ln in open(os.path.join(cap_dir, p)).read().strip().split("\n")
    ]
    metas = [_json.loads(ln) for ln in lines[0::2] if "index" in ln] or [
        _json.loads(ln) for ln in lines if '"index"' in ln
    ]
    docs = [ln for ln in lines if ln.startswith('{"v"')]
    got = sorted(
        (m["index"]["_id"] for m in metas if "index" in m), key=int
    )
    assert got == [str(i) for i in range(5)]
    assert all(m["index"]["_index"] == "idx_up" for m in metas)
    assert sorted(docs) == sorted('{"v": %d}' % i for i in range(5))


def test_incremental_replay_is_idempotent(spark, sink, tmp_path):
    """Running the same incremental batch twice (the reference's inclusive
    >= watermark re-delivers rows at the boundary) must leave the sink in
    an identical state — the idempotence that makes T2/T5 safe."""
    wm = WatermarkStore(str(tmp_path / "wm.json"))
    full_sync(spark, _docs(spark, BASE_ROWS), sink, now=datetime(2024, 2, 1))
    changed = BASE_ROWS + [
        ("alpha", "2", '{"v": 22}', False, "2024-01-15 00:00:00"),
        ("alpha", "4", '{"v": 4}', False, "2024-01-17 00:00:00"),
    ]
    for run_day in (2, 3):
        wm.set("default", datetime(2024, 1, 10))  # same watermark replayed
        incremental_sync(
            spark,
            _docs(spark, changed),
            sink,
            wm,
            now=datetime(2024, 2, run_day),
        )
        state = sorted(
            (r.id, r.document)
            for r in sink.read_alias(spark, "alpha").collect()
        )
        assert state == [
            ("1", '{"v": 1}'),
            ("2", '{"v": 22}'),
            ("4", '{"v": 4}'),
        ]
    # exactly one live generation per alias after the replay
    gens = [g for g in sink.list_generations() if g.startswith("alpha_")]
    assert gens == [sink.read_manifest()["alpha"]]

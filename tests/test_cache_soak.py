"""Long-session cache soak (VERDICT r7 task 7): the r6/r7 ADVICE persist
leaks were fixed with explicit release handles + GC finalizers; this test
pins those fixes by running the two previously-leaky paths N times in one
session and asserting executor storage returns to baseline — i.e. the
session does NOT accumulate one cache entry per call.

``localCheckpoint``-backed frames (the census inside near_dedup_keepers,
connected_components' labels) are unpersisted asynchronously by Spark's
ContextCleaner once the driver-side reference is garbage-collected, so the
assertion polls with a deadline instead of demanding instant zero.
"""

from __future__ import annotations

import gc
import time

import pytest

from tests.conftest import SF_DIR


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _settles_to(spark, baseline: int, slack: int = 0, deadline: float = 30.0) -> int:
    """Poll until the persistent-RDD count drops to ``baseline + slack``
    (ContextCleaner runs async); returns the final count either way."""
    end = time.time() + deadline
    while True:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        n = _persistent_rdd_count(spark)
        if n <= baseline + slack or time.time() > end:
            return n
        time.sleep(1.0)


N_ITER = 5


def test_near_dedup_keepers_soak_no_cache_growth(spark):
    from prefect_flow_arc_indexer_spark.operators.dedup import (
        near_dedup_keepers,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    baseline = _settles_to(spark, 0, slack=0, deadline=10.0)
    for _ in range(N_ITER):
        keepers, census = near_dedup_keepers(docs)
        assert keepers.count() > 0
        census.count()
        # the documented service-loop contract: release the component-label
        # checkpoint once keepers is materialized (a checkpoint is
        # invisible to df.unpersist AND never collected by the
        # ContextCleaner from PySpark — functions/caching.py). Since the
        # r11 CC driver gate, broadcast-sized graphs return labels as a
        # LOCAL relation (nothing persisted, release() -> False); the
        # storage-settles assertion below is the actual soak property
        # and holds on both paths.
        keepers.ckpt_release.release()
        del keepers, census
    final = _settles_to(spark, baseline)
    assert final <= baseline, (
        f"persistent RDDs grew {baseline} -> {final} over {N_ITER} "
        "near_dedup_keepers calls — a cache entry is leaking per call"
    )


def test_quarantine_reader_soak_no_cache_growth(spark, tmp_path):
    from prefect_flow_arc_indexer_spark.sources.files import (
        read_with_quarantine,
        release_quarantine,
    )

    baseline = _settles_to(spark, 0, slack=0, deadline=10.0)
    for i in range(N_ITER):
        # a FRESH path per iteration, like a service loop ingesting new
        # batches. (Re-reading the SAME path is a different hazard: Spark's
        # cache manager keys on the canonicalized plan, so releasing batch
        # i's cache would drop the identical-plan cache batch i+1 is
        # relying on — and the corrupt-record split requires the cache.)
        src = tmp_path / f"in{i}"
        src.mkdir()
        with open(src / "rows.json", "w") as f:
            f.write('{"id": 1, "name": "ok"}\n')
            f.write("broken line\n")
        good, bad = read_with_quarantine(
            spark, str(src), "json", "id long, name string"
        )
        assert good.count() == 1 and bad.count() == 1
        if i % 2 == 0:
            # explicit release path (the documented service-loop contract)
            assert release_quarantine(good) is True
        else:
            # forgotten-handle path: the weakref finalizer must backstop
            del good, bad
    final = _settles_to(spark, baseline)
    assert final <= baseline, (
        f"persistent RDDs grew {baseline} -> {final} over {N_ITER} "
        "quarantine reads — the parse cache is leaking per call"
    )


def test_fuzzy_family_soak_no_cache_growth(spark):
    """The r8 deletion-neighborhood rewrite gave q_fuzzy_match two cache
    handles (dn/ex) and q_golden_record a label checkpoint; loop both and
    assert executor storage returns to baseline (VERDICT r8 task 7)."""
    from prefect_flow_arc_indexer_spark.plans import all_queries

    reg = all_queries()
    baseline = _settles_to(spark, 0, slack=0, deadline=10.0)
    for _i in range(3):
        df = reg["q_fuzzy_match"].builder(spark, SF_DIR)
        assert df.count() > 0
        df.sig_release.release()
        df.dn_release.release()
        del df
        g = reg["q_golden_record"].builder(spark, SF_DIR)
        assert g.count() > 0
        # builder already released the edge snapshot + fuzzy caches; the
        # label checkpoint is the caller's (ADVICE r8). With the r11 CC
        # driver gate a broadcast-sized pair graph yields local-relation
        # labels instead (release() -> False, nothing persisted); the
        # settles-to-baseline assertion below pins the no-leak property
        # for whichever path ran.
        g.ckpt_release.release()
        del g
    final = _settles_to(spark, baseline)
    assert final <= baseline, (
        f"persistent RDDs grew {baseline} -> {final} over 3 fuzzy-family "
        "calls — a cache/checkpoint entry is leaking per call"
    )


def test_golden_record_error_exit_releases_fuzzy_state(spark, monkeypatch):
    """A connected_components raise must not strand the edge snapshot or
    the fuzzy dn/ex caches — the try/finally added for ADVICE r8."""
    import prefect_flow_arc_indexer_spark.operators.dedup as dedup_mod
    from prefect_flow_arc_indexer_spark.plans import all_queries

    baseline = _settles_to(spark, 0, slack=0, deadline=10.0)

    def boom(edges, **kw):
        raise RuntimeError("forced non-convergence (test)")

    monkeypatch.setattr(dedup_mod, "connected_components", boom)
    rq = all_queries()["q_golden_record"]
    with pytest.raises(RuntimeError, match="forced non-convergence"):
        rq.builder(spark, SF_DIR)
    final = _settles_to(spark, baseline)
    assert final <= baseline, (
        f"persistent RDDs grew {baseline} -> {final} across the error "
        "exit — the finally block is not releasing the fuzzy state"
    )


def test_r9_rewrites_soak_no_cache_growth(spark):
    """The three round-9 rewrites put NEW code on the leak-prone patterns
    (VERDICT r9 task 7): q_semdedup_capped's Arrow-batch matmul assignment
    (broadcast anchor matrix + cluster self-join), q_pagerank's per-round
    localCheckpoint fixed-point loop (persisted edge list released in the
    builder), and q_pca_power's per-round checkpointed power iteration.
    Loop all three and assert executor storage settles back to baseline."""
    from prefect_flow_arc_indexer_spark.plans import all_queries

    reg = all_queries()
    baseline = _settles_to(spark, 0, slack=0, deadline=10.0)
    for _i in range(3):
        for qn in ("q_semdedup_capped", "q_pagerank", "q_pca_power"):
            df = reg[qn].builder(spark, SF_DIR)
            assert df.count() > 0
            for handle in ("sig_release", "ckpt_release", "dn_release"):
                rel = getattr(df, handle, None)
                if rel is not None:
                    rel.release()
            del df
    final = _settles_to(spark, baseline)
    assert final <= baseline, (
        f"persistent RDDs grew {baseline} -> {final} over 3 rounds of the "
        "r9 rewrites — a cache/checkpoint entry is leaking per call"
    )


@pytest.mark.parametrize("_", [0])
def test_dedup_embedding_release_handle(spark, _):
    """q_dedup_embedding's self-join persist carries the same release
    contract as the LSH path; releasing it must leave nothing cached."""
    from prefect_flow_arc_indexer_spark.plans import all_queries

    baseline = _settles_to(spark, 0, slack=0, deadline=10.0)
    rq = all_queries()["q_dedup_embedding"]
    for _i in range(2):
        df = rq.builder(spark, SF_DIR)
        df.count()
        df.sig_release.release()
        del df
    final = _settles_to(spark, baseline)
    assert final <= baseline, (
        f"persistent RDDs grew {baseline} -> {final} after release()"
    )

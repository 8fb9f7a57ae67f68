"""Semantic tests for the sweep-line / VAD / chat-assembly wave — the
invariants the oracle hash alone doesn't state explicitly."""

from __future__ import annotations

from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR


def _run(name, spark, sf=SF_DIR):
    return all_queries()[name].builder(spark, sf)


def test_backlog_sweep_conservation(spark):
    """Every +1 has a matching -1: deltas sum to zero, the running count
    never goes negative, and the curve returns to zero on the last day."""
    rows = sorted(
        _run("q_backlog_sweep", spark).collect(), key=lambda r: r["day"]
    )
    assert sum(r["delta"] for r in rows) == 0
    running = 0
    for r in rows:
        running += r["delta"]
        assert running == r["open_items"]
        assert running >= 0
    assert rows[-1]["open_items"] == 0


def test_speech_vad_segment_accounting(spark):
    """Active windows partition exactly into segments; fraction bounds."""
    rows = _run("q_speech_vad", spark).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_active"] <= r["n_windows"]
        assert (r["n_segments"] > 0) == (r["n_active"] > 0)
        assert r["longest_seg"] <= r["n_active"]
        # n_segments segments of >=1 window each, none longer than longest
        assert r["n_segments"] <= r["n_active"]
        assert r["n_segments"] * r["longest_seg"] >= r["n_active"]
        assert 0.0 <= r["active_frac"] <= 1.0


def test_chat_assembly_budget_and_prefix(spark):
    """Budget respected, transcript length == kept count, and the session
    grain matches the registered sessionizer's session count."""
    from prefect_flow_arc_indexer_spark.operators.sessionize import (
        CHAT_TOKEN_BUDGET,
    )

    rows = _run("q_chat_assembly", spark).collect()
    n_sessions = _run("q_session_window", spark).count()
    assert len(rows) == n_sessions
    for r in rows:
        assert r["tokens_used"] <= CHAT_TOKEN_BUDGET
        assert 0 <= r["n_kept"] <= r["n_events"]
        turns = [t for t in r["transcript"].split("|") if t]
        assert len(turns) == r["n_kept"]
        # every event costs >= 1 token, so kept turns can't exceed budget
        assert r["n_kept"] <= CHAT_TOKEN_BUDGET
        if r["n_kept"] > 0:
            assert r["tokens_used"] >= r["n_kept"]


def test_late_census_partition_and_bounds(spark):
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    rows = _run("q_late_census", spark).collect()
    total = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n_events"] for r in rows) == total
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    bounds = {"on-time": (0, 0), "<1m": (1, 60_000_000 - 1),
              "<10m": (60_000_000, 600_000_000 - 1),
              "<1h": (600_000_000, 3_600_000_000 - 1),
              ">=1h": (3_600_000_000, None)}
    assert set(r["bucket"] for r in rows) <= set(bounds)
    for r in rows:
        lo, hi = bounds[r["bucket"]]
        assert r["max_late_us"] >= lo
        if hi is not None:
            assert r["max_late_us"] <= hi


def test_audio_spectral_matches_pure_python_dft(spark):
    """The numpy rFFT features must equal a pure-Python O(W^2) DFT replay
    (independent of numpy's FFT): dominant bin exactly, centroid to 1e-5."""
    import cmath

    from pyspark.sql import functions as F

    from prefect_flow_arc_indexer_spark.multimodal.binary import (
        AUDIO_WINDOW,
        media_frame,
    )
    from prefect_flow_arc_indexer_spark.plans import all_queries

    out = all_queries()["q_audio_spectral"].builder(spark, SF_DIR).collect()
    assert out
    by_key = {(r["doc_id"], r["window_idx"]): r for r in out}
    probe_doc = out[0]["doc_id"]
    payload = bytes(
        media_frame(spark, SF_DIR)
        .where(F.col("doc_id") == probe_doc)
        .head()["payload"]
    )
    n_full = len(payload) // AUDIO_WINDOW
    assert n_full >= 1
    for widx in range(n_full):
        win = [
            float(b)
            for b in payload[widx * AUDIO_WINDOW : (widx + 1) * AUDIO_WINDOW]
        ]
        mean = sum(win) / AUDIO_WINDOW
        win = [v - mean for v in win]
        mags = []
        for k in range(1, AUDIO_WINDOW // 2 + 1):
            z = sum(
                v * cmath.exp(-2j * cmath.pi * k * t / AUDIO_WINDOW)
                for t, v in enumerate(win)
            )
            mags.append(abs(z))
        dom = max(range(len(mags)), key=lambda i: (mags[i], -i)) + 1
        tot = sum(mags)
        cent = (
            sum((i + 1) * m for i, m in enumerate(mags)) / tot if tot else 0.0
        )
        r = by_key[(probe_doc, widx)]
        assert r["dominant_bin"] == dom
        assert abs(r["centroid"] - cent) < 1e-5

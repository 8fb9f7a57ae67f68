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

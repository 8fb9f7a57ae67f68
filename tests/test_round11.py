"""Round-11 additions: the audit-allowlist ratchet, the top-k-first
conversions of the former global-vocab windows, the q_publish_manifest
atomic-publish lifecycle, and the checkpoint-release hygiene sweep
(ADVICE r10).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.plans import all_queries

from conftest import SF_DIR, SF_DIR_MID

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))


# --------------------------------------------------------------------------
# explain-audit allowlist ratchet (VERDICT r10 task 5)
# --------------------------------------------------------------------------
def test_allowlist_ratchet_only_shrinks():
    """The global-window allowlist may only shrink: every current entry
    must be inside the frozen r11 baseline, and the baseline itself must
    not have regrown past the 10-entry r11 state."""
    import explain_audit as ea

    assert not ea.RATCHET_VIOLATIONS, (
        f"allowlist grew beyond the ratchet: {ea.RATCHET_VIOLATIONS} — "
        "fix the plan (top-k-first / partition key), don't allowlist"
    )
    assert set(ea.BOUNDED_GLOBAL_WINDOWS) <= ea.ALLOWLIST_RATCHET
    assert len(ea.ALLOWLIST_RATCHET) <= 10


def test_retired_allowlist_entries_stay_retired():
    """The six LIMIT-bounded entries retired in r11 must never re-enter:
    their windows are now detected structurally, not waived."""
    import explain_audit as ea

    retired = {
        "q_zipf_fit",
        "q_vocab_coverage",
        "q_source_keywords",
        "q_pagerank",
        "q_returned_top_customers",
        "q_negative_sampling",
    }
    assert not retired & set(ea.BOUNDED_GLOBAL_WINDOWS)
    assert not retired & ea.ALLOWLIST_RATCHET


def _global_windows(df):
    import explain_audit as ea

    return ea.unpartitioned_windows(df._jdf.queryExecution().executedPlan())


def test_zipf_and_vocab_plans_are_limit_bounded(spark):
    """The converted queries must plan with NO unbounded global window:
    the structural detector (unary chain through a LIMIT node) accepts
    their survivor-ranking windows, and the plan text shows the top-k
    operator."""
    reg = all_queries()
    for name in ("q_zipf_fit", "q_vocab_coverage"):
        df = reg[name].builder(spark, SF_DIR)
        assert _global_windows(df) == [], f"{name} has an unbounded window"
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, f"{name}: no top-k operator"


def test_source_keywords_plan_has_no_global_window(spark):
    """q_source_keywords' scalar total is now aggregate+crossJoin — the
    plan must contain no unpartitioned WindowExec at all."""
    reg = all_queries()
    df = reg["q_source_keywords"].builder(spark, SF_DIR)
    assert _global_windows(df) == []


# --------------------------------------------------------------------------
# q_publish_manifest (VERDICT r10 task 6 — X6 atomic publish, driver-gated)
# --------------------------------------------------------------------------
def test_publish_manifest_exactly_one_live_generation(spark):
    reg = all_queries()
    out = reg["q_publish_manifest"].builder(spark, SF_DIR)
    rows = {r["alias"]: r for r in out.collect()}
    assert set(rows) == {"click", "purchase", "signup"}
    for alias, r in rows.items():
        assert r["live_generation"] == f"{alias}_2024-01-02t00.00.00"
        assert r["n_disk_generations"] == 1, "superseded generation on disk"
        assert r["old_dropped"] is True
        assert r["n_live_docs"] > 0
    assert out.ckpt_release.release() is True


def test_publish_manifest_counts_match_live_set(spark):
    """n_live_docs is read back THROUGH the published alias; it must equal
    the active-doc count per index from the base table."""
    from prefect_flow_arc_indexer_spark.operators.indexer import (
        TARGET_INDEXES,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import (
        index_documents,
    )

    reg = all_queries()
    got = {
        r["alias"]: r["n_live_docs"]
        for r in reg["q_publish_manifest"].builder(spark, SF_DIR).collect()
    }
    want = {
        r["index"]: r["n"]
        for r in index_documents(spark, SF_DIR)
        .where(F.col("index").isin(*TARGET_INDEXES) & ~F.col("is_deleted"))
        .groupBy("index")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# checkpoint-release hygiene (ADVICE r10)
# --------------------------------------------------------------------------
def test_cdc_module_imports_standalone():
    """operators.cdc must be importable before operators.indexer (it
    forces the registration it depends on instead of reading another
    module's entry out of a half-populated registry)."""
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, '.');"
            "import prefect_flow_arc_indexer_spark.operators.cdc",
        ],
        cwd=str(ROOT),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-500:]


def test_round11_release_handles_attached(spark):
    """Every query that r11 gave a checkpoint a release handle for must
    actually expose one, and releasing after materialization must
    unpersist a real checkpoint (returns True)."""
    reg = all_queries()
    for name in (
        "q_stream_batch_parity",
        "q_simhash_pairs",
        "q_simhash_capped",
        "q_band_sweep",
        "q_source_keywords",
        "q_vocab_coverage",
        "q_phash_pairs",
        "q_triangle_count",
        "q_unigram_surprisal",
        "q_oov_rate",
        "q_sync_cycle",
        "q_ccnet_buckets",
        "q_bitext_margin",
    ):
        df = reg[name].builder(spark, SF_DIR)
        df.collect()
        handle = getattr(df, "ckpt_release", None)
        assert handle is not None, f"{name}: no ckpt_release handle"
        assert handle.release() is True, f"{name}: release was a no-op"
        extra = getattr(df, "dn_release", None)
        if extra is not None:  # q_sync_cycle's second compaction
            assert extra.release() is True


def test_bpe_merges_releases_loop_checkpoints(spark):
    """q_bpe_merges checkpoints the folded vocab per merge round; after the
    call returns (a driver-local merge table) no persistent RDDs may
    remain from the loop (the q_pagerank per-iteration leak class)."""
    sc = spark.sparkContext._jsc.sc()
    before = sc.getPersistentRDDs().size()
    reg = all_queries()
    assert reg["q_bpe_merges"].builder(spark, SF_DIR).count() > 0
    assert sc.getPersistentRDDs().size() == before


def test_pagerank_empty_corpus_strands_no_blocks(spark, tmp_path):
    """The n == 0 early return must not leave checkpoint blocks behind
    (the dangling-set checkpoint now happens after the guard)."""
    import shutil

    src = Path(SF_DIR)
    for t in src.glob("*.parquet"):
        if t.stem == "documents":
            continue
        shutil.copy(t, tmp_path / t.name)
    empty = spark.read.parquet(str(src / "documents.parquet")).limit(0)
    empty.write.parquet(str(tmp_path / "documents.parquet"))

    sc = spark.sparkContext._jsc.sc()
    before = sc.getPersistentRDDs().size()
    reg = all_queries()
    out = reg["q_pagerank"].builder(spark, str(tmp_path))
    assert out.count() == 0
    assert sc.getPersistentRDDs().size() == before

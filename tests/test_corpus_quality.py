"""Corpus-quality / layout extensions (corpus_quality.py, layout.py):
oracle parity at sf0.001 plus semantic checks — hash equality proves
cross-engine agreement, these prove the operators mean what they claim."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators.corpus_quality import (
    COOCCUR_MIN_PAIRS,
    PACK_CONTEXT,
    PSI_BINS,
    RESERVOIR_K,
)
from prefect_flow_arc_indexer_spark.operators.layout import QBIN_N, ZORDER_BITS
from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR
from tests.helpers import assert_matches_oracle

NEW_QUERIES = [
    "q_bm25",
    "q_gopher_rules",
    "q_ks_drift",
    "q_psi_drift",
    "q_winsorize",
    "q_cooccurrence",
    "q_pack_sequences",
    "q_reservoir_sample",
    "q_zorder_key",
    "q_quantile_bins",
    "q_dataset_card",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_parity(spark, name, duck):
    rq = all_queries()[name]
    assert_matches_oracle(rq.builder(spark, SF_DIR), duck, rq.oracle)


def test_bm25_ranks_are_dense_and_ordered(spark):
    rows = all_queries()["q_bm25"].builder(spark, SF_DIR).collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    assert by_term, "bm25 returned no terms"
    for term, hits in by_term.items():
        hits.sort(key=lambda r: r["rk"])
        assert [h["rk"] for h in hits] == list(range(1, len(hits) + 1))
        scores = [h["bm25"] for h in hits]
        assert scores == sorted(scores, reverse=True), term
        # a doc mentioning the term more (same length class) never ranks
        # below one mentioning it less at equal score precision
        assert all(h["tf"] >= 1 for h in hits)


def test_gopher_keep_iff_no_fail_reason(spark):
    rows = all_queries()["q_gopher_rules"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (r["fail_reason"] is None)
    # the synthetic corpus exercises both verdicts
    verdicts = {r["keep"] for r in rows}
    assert verdicts == {True, False}


def test_ks_drift_bounds(spark):
    row = all_queries()["q_ks_drift"].builder(spark, SF_DIR).collect()[0]
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert row["n_train"] > 0 and row["n_holdout"] > 0
    # the two splits come from the same distribution -> small D
    assert row["ks_stat"] < 0.5


def test_psi_terms_sum_to_small_psi(spark):
    rows = all_queries()["q_psi_drift"].builder(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= PSI_BINS
    psi = sum(r["psi_term"] for r in rows)
    # same-distribution splits: no real drift. The classic "no drift" rule
    # of thumb is 0.1, but at sf0.001 the holdout stratum is ~100 docs and
    # Laplace smoothing over 10 bins adds small-sample inflation — bound
    # loosely here; the point is it is nowhere near a drifted ~1.0
    assert psi < 0.3
    assert all(r["n_train"] >= 0 and r["n_holdout"] >= 0 for r in rows)


def test_winsorized_mean_within_clip_bounds(spark):
    rows = all_queries()["q_winsorize"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["p05"] <= r["p95"]
        assert r["p05"] <= r["mean_winsorized"] <= r["p95"]


def test_cooccurrence_pmi_identity(spark):
    """PMI must reproduce ln(n_pair * N / (df_a * df_b)) against
    independently computed doc frequencies."""
    rows = all_queries()["q_cooccurrence"].builder(spark, SF_DIR).collect()
    assert rows
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit("")
                )
            ).alias("term"),
        )
        .distinct()
    )
    n_docs = docs.select("doc_id").distinct().count()
    df = {r["term"]: r["cnt"] for r in docs.groupBy("term").agg(
        F.count("*").alias("cnt")).collect()}
    for r in rows[:20]:
        assert r["n_pair"] >= COOCCUR_MIN_PAIRS
        assert r["term_a"] < r["term_b"]
        want = math.log(
            r["n_pair"] * n_docs / (df[r["term_a"]] * df[r["term_b"]])
        )
        assert abs(r["pmi"] - want) < 1e-5


def test_pack_sequences_offsets_consistent(spark):
    rows = (
        all_queries()["q_pack_sequences"]
        .builder(spark, SF_DIR)
        .orderBy("doc_id")
        .collect()
    )
    assert rows
    running = 0
    for r in rows:
        assert r["pack_id"] == running // PACK_CONTEXT
        assert r["pack_offset"] == running % PACK_CONTEXT
        running += r["n_tokens"]


def test_reservoir_exactly_k_per_stratum(spark):
    rows = (
        all_queries()["q_reservoir_sample"].builder(spark, SF_DIR).collect()
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    got: dict[str, int] = {}
    for r in rows:
        got[r["source"]] = got.get(r["source"], 0) + 1
    for src, n in per_source.items():
        assert got.get(src, 0) == min(RESERVOIR_K, n), src


def test_zorder_key_bit_interleave(spark):
    rows = (
        all_queries()["q_zorder_key"].builder(spark, SF_DIR).limit(50).collect()
    )
    assert rows
    for r in rows:
        z = 0
        for i in range(ZORDER_BITS):
            z |= ((r["x"] >> i) & 1) << (2 * i)
            z |= ((r["y"] >> i) & 1) << (2 * i + 1)
        assert r["zkey"] == z
    # locality: close (x, y) boxes map to bounded zkey ranges — the box
    # (x0..x0+1, y0..y0+1) spans at most 2 bits of interleave
    r0 = rows[0]
    z_same = r0["zkey"]
    z_flip_low = z_same ^ 1  # flipping x bit 0 flips zkey bit 0
    assert abs(z_flip_low - z_same) == 1


def test_dataset_card_totals_reconcile(spark):
    """Card totals must reconcile with the raw corpus (the card is the
    artifact people trust without rechecking — make the build recheck)."""
    rows = all_queries()["q_dataset_card"].builder(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert sum(r["total_chars"] for r in rows) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )
    for r in rows:
        assert 0 <= r["n_unique_texts"] <= r["n_docs"]
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert r["min_tokens"] <= r["max_tokens"]


def test_quantile_bins_equal_frequency(spark):
    rows = all_queries()["q_quantile_bins"].builder(spark, SF_DIR).collect()
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r)
    for flag, bins in by_flag.items():
        assert len(bins) == QBIN_N, flag
        counts = [b["n_items"] for b in bins]
        assert max(counts) - min(counts) <= 1, flag  # ntile equal split
        bins.sort(key=lambda b: b["bin"])
        for a, b in zip(bins, bins[1:]):
            assert a["bin_max"] <= b["bin_min"] + 1e-9, flag

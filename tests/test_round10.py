"""Round-10 additions: the capped SimHash twin, the stream==batch parity
query, and the small-corpus gates behind the embedding-dedup assignment.

Gate discipline (f91d8c8): whenever a query picks between two plans on a
size gate, BOTH plans must produce the identical (oracle) result — the
tests force each side via monkeypatch and compare.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators import dedup
from prefect_flow_arc_indexer_spark.plans import all_queries

from conftest import SF_DIR, SF_DIR_MID


def _rows(df, cols=None):
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())


# --------------------------------------------------------------------------
# q_simhash_capped / q_simhash_band_census
# --------------------------------------------------------------------------
def test_simhash_capped_subset_of_uncapped(spark):
    reg = all_queries()
    capped = _rows(reg["q_simhash_capped"].builder(spark, SF_DIR_MID))
    full = set(_rows(reg["q_simhash_pairs"].builder(spark, SF_DIR_MID)))
    assert capped, "capped pair set empty at sf0.01 — fixture drifted"
    assert all(p in full for p in capped)


def test_simhash_capped_equals_uncapped_when_cap_loose(spark, monkeypatch):
    """With the cap above every bucket size the capped query IS the
    uncapped contract — proving the cap is surgical, not a rewrite."""
    monkeypatch.setattr(dedup, "SIMHASH_BUCKET_CAP", 10_000_000)
    reg = all_queries()
    capped = _rows(reg["q_simhash_capped"].builder(spark, SF_DIR))
    full = _rows(reg["q_simhash_pairs"].builder(spark, SF_DIR))
    assert capped == full


def test_simhash_band_census_accounts_for_cap(spark):
    """Census bookkeeping: dropped docs and retained-candidate fraction
    must agree with the raw bucket-size distribution."""
    reg = all_queries()
    census = {
        r["band_id"]: r
        for r in reg["q_simhash_band_census"].builder(spark, SF_DIR_MID).collect()
    }
    assert set(census) == {0, 1, 2, 3}
    cap = dedup.SIMHASH_BUCKET_CAP
    for r in census.values():
        assert 0 < r["cand_retained_frac"] <= 1.0
        if r["max_bucket"] <= cap:
            assert r["n_docs_dropped"] == 0
            assert r["cand_retained_frac"] == 1.0
        else:
            assert r["n_docs_dropped"] > 0
            assert r["cand_retained_frac"] < 1.0


# --------------------------------------------------------------------------
# q_stream_batch_parity
# --------------------------------------------------------------------------
def test_stream_parity_equals_batch_merge(spark):
    """The availableNow foreachBatch fold must equal the batch CDC merge
    row-for-row — the in-process form of the driver's oracle gate."""
    reg = all_queries()
    got = _rows(reg["q_stream_batch_parity"].builder(spark, SF_DIR))
    want = _rows(reg["q_cdc_merge"].builder(spark, SF_DIR))
    assert got == want
    assert got, "empty merge result — fixture drifted"


def test_stream_parity_folds_multiple_microbatches(spark):
    """The feed re-chunking must actually produce >1 micro-batch; a single
    batch would make the parity trivial (no cross-batch state merge)."""
    from prefect_flow_arc_indexer_spark.operators.cdc import _PARITY_CHUNKS

    assert _PARITY_CHUNKS > 1


# --------------------------------------------------------------------------
# embedding-assignment small-corpus gate
# --------------------------------------------------------------------------
def test_embedding_gate_small_and_big_paths_agree(spark, monkeypatch):
    reg = all_queries()
    builder = reg["q_dedup_embedding"].builder

    monkeypatch.setattr(dedup, "EMB_SMALL_CORPUS_GATE", 10_000)
    small = _rows(builder(spark, SF_DIR_MID))

    monkeypatch.setattr(dedup, "EMB_SMALL_CORPUS_GATE", 0)
    big = builder(spark, SF_DIR_MID)
    big_rows = _rows(big)
    big.sig_release.release()

    assert small == big_rows
    assert small, "empty pair set at sf0.01 — fixture drifted"


def test_embedding_census_gate_paths_agree(spark, monkeypatch):
    reg = all_queries()
    builder = reg["q_embedding_cell_census"].builder

    monkeypatch.setattr(dedup, "EMB_SMALL_CORPUS_GATE", 10_000)
    small = _rows(builder(spark, SF_DIR_MID))

    monkeypatch.setattr(dedup, "EMB_SMALL_CORPUS_GATE", 0)
    big = builder(spark, SF_DIR_MID)
    big_rows = _rows(big)
    getattr(big, "sig_release", dedup._NoopRelease()).release()

    assert small == big_rows


def test_table_row_count_matches_spark(spark):
    from prefect_flow_arc_indexer_spark.sources.parquet import (
        load_table,
        table_row_count,
    )

    for t in ("embeddings", "documents"):
        assert table_row_count(spark, SF_DIR, t) == load_table(
            spark, SF_DIR, t
        ).count()
    with pytest.raises(KeyError):
        table_row_count(spark, SF_DIR, "nope")


# --------------------------------------------------------------------------
# shingle pipeline: map-side distinct must keep per-doc set semantics
# --------------------------------------------------------------------------
def test_hashed_shingles_are_distinct_per_doc(spark):
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sh = dedup._hashed_shingles(docs)
    total = sh.count()
    distinct = sh.distinct().count()
    assert total == distinct, "duplicate (doc, shingle) rows survived"

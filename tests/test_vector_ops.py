"""Round-5 vector ops: filtered search obeys its predicate, the semi-hard
band caps negatives, the audit counts zero vectors, and the MMR greedy is
pinned bit-for-bit by a pure-Python replay."""

from __future__ import annotations

import shutil

import duckdb
import pytest

from prefect_flow_arc_indexer_spark.operators.vector_ops import (
    FILTER_MOD,
    HN_CAP_MICRO,
    MMR_K,
    MMR_POOL,
    N_QUERIES,
    _cos,
    mmr_select,
)
from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR


def test_filtered_knn_only_returns_allowed_labels(spark):
    rows = all_queries()["q_filtered_knn"].builder(spark, SF_DIR).collect()
    assert rows
    assert all(r.label % FILTER_MOD == 0 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == set(range(N_QUERIES))
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_semihard_negatives_respect_band_and_label(spark):
    rows = (
        all_queries()["q_semihard_negatives"].builder(spark, SF_DIR).collect()
    )
    assert rows
    assert all(r.cos_micro < HN_CAP_MICRO for r in rows)
    assert all(r.neg_label != r.q_label for r in rows)


def test_embedding_audit_counts_zero_vectors(spark, tmp_path):
    dst = tmp_path / "audit_sf"
    dst.mkdir()
    duckdb.connect().execute(
        f"""COPY (
  SELECT CAST(1 AS BIGINT) AS vec_id, [1.0, 0.0, 2.0]::FLOAT[] AS embedding,
         CAST(7 AS INT) AS label
  UNION ALL SELECT 2, [0.0, 0.0, 0.0]::FLOAT[], 7
  UNION ALL SELECT 3, [3.0, 4.0, 0.0]::FLOAT[], 8
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{dst}/{t}.parquet")
    rows = {
        r.label: r
        for r in all_queries()["q_embedding_audit"]
        .builder(spark, str(dst))
        .collect()
    }
    assert rows[7].n_vecs == 2 and rows[7].n_zero == 1
    assert rows[7].min_norm_micro == 0
    assert rows[8].n_zero == 0
    assert rows[8].max_norm_micro == 5_000_000  # |[3,4,0]| = 5 exactly


@pytest.fixture(scope="module")
def corpus_vectors():
    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    return {int(v): [float(x) for x in emb] for v, emb in rows}


def test_mmr_rerank_matches_pure_python_replay(spark, corpus_vectors):
    got = sorted(
        (r.query_id, r.mmr_rank, r.neighbor_id, r.mmr_score)
        for r in all_queries()["q_mmr_rerank"].builder(spark, SF_DIR).collect()
    )
    want = []
    for qid in range(N_QUERIES):
        q_emb = corpus_vectors[qid]
        scored = [
            (nid, _cos(q_emb, emb), emb)
            for nid, emb in corpus_vectors.items()
            if nid != qid
        ]
        pool = sorted(scored, key=lambda t: (-t[1], t[0]))[:MMR_POOL]
        for nid, rank, score in mmr_select(pool):
            want.append((qid, rank, nid, score))
    assert got == sorted(want)


def test_mmr_first_pick_is_most_relevant_and_ranks_contiguous(spark):
    rows = all_queries()["q_mmr_rerank"].builder(spark, SF_DIR).collect()
    per_q: dict[int, dict[int, int]] = {}
    for r in rows:
        per_q.setdefault(r.query_id, {})[r.mmr_rank] = r.neighbor_id
    knn = {
        (r.query_id, r.rank): r.neighbor_id
        for r in all_queries()["q_knn_cosine"].builder(spark, SF_DIR).collect()
    }
    for qid, picks in per_q.items():
        assert sorted(picks) == list(range(1, MMR_K + 1))
        # rank-1 MMR pick == the plain top-1 neighbor (lambda-weighted
        # relevance dominates when nothing is selected yet)
        assert picks[1] == knn[(qid, 1)]


def test_cluster_profile_shares_and_join(spark):
    rows = all_queries()["q_cluster_profile"].builder(spark, SF_DIR).collect()
    assert rows
    per_label: dict[int, list] = {}
    for r in rows:
        per_label.setdefault(r.label, []).append(r)
    for label, group in per_label.items():
        n_label = sum(r.n_docs for r in group)
        # integer floor shares: sum within floor(1e6) of exactly 1e6
        total_share = sum(r.share_micro for r in group)
        assert 1_000_000 - len(group) < total_share <= 1_000_000
        assert all(
            r.share_micro == (1_000_000 * r.n_docs) // n_label for r in group
        )


def test_knn_classify_one_prediction_per_query(spark):
    rows = all_queries()["q_knn_classify"].builder(spark, SF_DIR).collect()
    assert sorted(r.query_id for r in rows) == list(range(N_QUERIES))
    from prefect_flow_arc_indexer_spark.operators.vector_ops import KNN_VOTE_K

    for r in rows:
        assert 1 <= r.n_votes <= KNN_VOTE_K
        assert r.correct == int(r.predicted_label == r.true_label)

"""Semantic tests for hybrid retrieval and the applied mixture sample:
funnel invariants (every reranked hit shares a recall gram; ranks are
contiguous and cosine-ordered) and sampling invariants (keep verdict is
exactly the bucket threshold; realized rates track the target)."""

from __future__ import annotations

from collections import defaultdict

from prefect_flow_arc_indexer_spark.operators.retrieval import (
    RETR_N_QUERIES,
    RETR_TOP_K,
    q_hybrid_retrieval,
)
from prefect_flow_arc_indexer_spark.plans.registry import all_queries
from tests.conftest import SF_DIR
from tests.helpers import assert_matches_oracle


def test_hybrid_retrieval_funnel(spark, duck):
    rows = q_hybrid_retrieval(spark, SF_DIR).collect()
    assert rows
    per_q = defaultdict(list)
    for r in rows:
        assert r["query_id"] < RETR_N_QUERIES
        assert r["doc_id"] != r["query_id"]
        assert r["n_shared_grams"] >= 1  # recall stage really gated entry
        assert 1 <= r["rank"] <= RETR_TOP_K
        per_q[r["query_id"]].append(r)
    for q, hits in per_q.items():
        hits.sort(key=lambda r: r["rank"])
        assert [h["rank"] for h in hits] == list(range(1, len(hits) + 1))
        sims = [h["cos_sim"] for h in hits]
        assert sims == sorted(sims, reverse=True)
    assert_matches_oracle(
        q_hybrid_retrieval(spark, SF_DIR),
        duck,
        all_queries()["q_hybrid_retrieval"].oracle,
    )


def test_mixture_apply_thresholds(spark, duck):
    from prefect_flow_arc_indexer_spark.operators.feature_ops import (
        MIX_BUCKETS,
        q_mixture_weights,
    )

    rates = {
        r["source"]: r["sample_rate"]
        for r in q_mixture_weights(spark, SF_DIR).collect()
    }
    applied = all_queries()["q_mixture_apply"].builder(spark, SF_DIR)
    rows = applied.collect()
    assert rows
    kept = defaultdict(int)
    total = defaultdict(int)
    for r in rows:
        thr = int(rates[r["source"]] * MIX_BUCKETS)
        assert r["keep"] == (r["bucket"] < thr)
        total[r["source"]] += 1
        kept[r["source"]] += int(r["keep"])
    # realized rate tracks the target within 4-sigma binomial noise
    # (sources are tiny at this SF — 25 docs each — so the band is wide)
    for src, n in total.items():
        realized = kept[src] / n
        p = rates[src]
        sd = (p * (1 - p) / n) ** 0.5
        assert abs(realized - p) <= 4 * sd + 1 / n, (src, realized, p)
    # and the corpus-level realized rate is much tighter
    n_all = sum(total.values())
    rate_all = sum(kept.values()) / n_all
    target_all = sum(rates[s] * total[s] for s in total) / n_all
    assert abs(rate_all - target_all) < 0.07
    assert_matches_oracle(
        applied, duck, all_queries()["q_mixture_apply"].oracle
    )

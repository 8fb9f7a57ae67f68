"""Degenerate-bucket cap for LSH pair generation (VERDICT r5 task 2):
an all-identical-docs corpus must not explode quadratically through the
capped production path, the census must account for every sidelined
bucket, and a non-binding cap must reproduce the exact pair set."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators.dedup import (
    lsh_candidate_pairs,
    lsh_candidate_pairs_capped,
    minhash_signature,
    near_dedup_keepers,
    N_BANDS,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _boilerplate(n):
    """n docs with IDENTICAL text: every band buckets all n together.
    Ids are numeric strings (connected_components' convergence scalar sums
    labels, matching the documents table's numeric doc_ids)."""
    return [(str(9000 + i), "the same boilerplate text repeated everywhere")
            for i in range(n)]


def test_all_identical_docs_bounded_pair_volume(spark):
    docs = _docs(spark, _boilerplate(50))
    pairs, census = lsh_candidate_pairs_capped(
        minhash_signature(docs), max_bucket_size=5
    )
    # 50 identical docs would emit 50*49/2 = 1225 pairs per band uncapped;
    # the cap sidelines all four band buckets instead
    assert pairs.count() == 0
    rows = census.collect()
    assert len(rows) == N_BANDS
    assert all(r.bucket_size == 50 for r in rows)


def test_cap_is_surgical_honest_buckets_survive(spark):
    """The cap removes ONLY the degenerate bucket: an honest near-dup pair
    sharing the corpus still comes out."""
    rows = _boilerplate(30) + [
        ("101", "the quick brown fox jumps over the lazy dog tonight"),
        ("102", "the quick brown fox jumps over the lazy dog today"),
        ("103", "completely unrelated content about spark partitions"),
    ]
    pairs, census = lsh_candidate_pairs_capped(
        minhash_signature(_docs(spark, rows)), max_bucket_size=5
    )
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert ("101", "102") in got
    assert all(not a.startswith("9") and not b.startswith("9") for a, b in got)
    assert census.count() == N_BANDS


def test_non_binding_cap_matches_exact_pairs(spark):
    rows = _boilerplate(6) + [
        ("101", "the quick brown fox jumps over the lazy dog tonight"),
        ("102", "the quick brown fox jumps over the lazy dog today"),
    ]
    sig = minhash_signature(_docs(spark, rows))
    exact = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sig).collect()}
    capped, census = lsh_candidate_pairs_capped(sig, max_bucket_size=10**6)
    assert {(r.doc_a, r.doc_b) for r in capped.collect()} == exact
    assert census.count() == 0


def test_near_dedup_keepers_caps_and_reports(spark):
    """Production path: cap default-on; with a binding cap the boilerplate
    cluster contributes no edges (each doc keeps itself) and the census is
    returned for audit; honest near-dups still collapse to one keeper."""
    rows = _boilerplate(40) + [
        ("101", "the quick brown fox jumps over the lazy dog tonight"),
        ("102", "the quick brown fox jumps over the lazy dog today"),
    ]
    keepers, census = near_dedup_keepers(_docs(spark, rows), max_bucket_size=5)
    k = {r.doc_id: r.component_size for r in keepers.collect()}
    # pair_a/pair_b collapse into one keeper of size 2
    assert k.get("101") == 2 and "102" not in k
    # every boilerplate doc survives as its own keeper (edges were capped)
    assert sum(1 for d in k if d.startswith("9")) == 40
    assert len(k) == 40 + 1
    assert census.count() == N_BANDS


def test_capped_pairs_release_frees_signature_cache(spark):
    """ADVICE r6: the persisted signature frame must be releasable — the
    returned frames carry a shared release handle, and the production path
    (near_dedup_keepers) releases it itself, so repeated calls in a
    long-lived session don't accumulate one cache entry per invocation."""
    # the CacheManager tracks persist() entries only (localCheckpoint
    # blocks live RDD-side and are ContextCleaner-reclaimed), so an empty
    # manager is exactly "no leaked persist"
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    cache_mgr.clearCache()

    sig = minhash_signature(_docs(spark, _boilerplate(8)))
    pairs, census = lsh_candidate_pairs_capped(sig, max_bucket_size=5)
    assert pairs.sig_release is census.sig_release
    pairs.count()
    assert not cache_mgr.isEmpty()  # signature frame is cached during use
    pairs.sig_release.release()
    assert cache_mgr.isEmpty()  # and gone after release
    pairs.sig_release.release()  # idempotent

    # production path releases internally: no persist entry remains
    rows = _boilerplate(8) + [
        ("101", "the quick brown fox jumps over the lazy dog tonight"),
        ("102", "the quick brown fox jumps over the lazy dog today"),
    ]
    keepers, cen = near_dedup_keepers(_docs(spark, rows), max_bucket_size=5)
    keepers.count(), cen.count()
    assert cache_mgr.isEmpty()


def test_capped_plan_counts_before_collecting(spark):
    """Plan shape: the over-cap filter must act BEFORE the collect_list
    aggregation — the physical plan joins against the broadcast census
    below the final aggregate, so no aggregation row ever materializes a
    degenerate bucket's id array."""
    sig = minhash_signature(_docs(spark, _boilerplate(8)))
    pairs, _ = lsh_candidate_pairs_capped(sig, max_bucket_size=5)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

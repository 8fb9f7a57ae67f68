"""Semantic tests for the corpus-filter family (thresholds derived from the
corpus itself): oracle parity plus the invariants the oracles can't state —
tercile ordering, percentile keep-band coverage, keeper-partition exactness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators.corpus_filter import (
    q_boilerplate,
    q_ccnet_buckets,
    q_length_trim,
)
from prefect_flow_arc_indexer_spark.plans.registry import all_queries
from tests.conftest import SF_DIR
from tests.helpers import assert_matches_oracle


def test_length_trim_band_and_parity(spark, duck):
    out = q_length_trim(spark, SF_DIR).collect()
    assert out, "empty result"
    lo, hi = out[0]["lo"], out[0]["hi"]
    assert lo <= hi
    kept = sum(1 for r in out if r["keep"])
    n = len(out)
    # discrete p01/p99 band: at most ~2% (plus boundary ties) drops out,
    # and the band always contains the bulk of the corpus
    assert kept >= 0.95 * n
    for r in out:
        assert r["keep"] == (lo <= r["n_tok"] <= hi)
    assert_matches_oracle(
        q_length_trim(spark, SF_DIR), duck, all_queries()["q_length_trim"].oracle
    )


def test_ccnet_terciles_ordered_and_balanced(spark):
    rows = q_ccnet_buckets(spark, SF_DIR).collect()
    assert rows
    by_bucket: dict[str, list[int]] = {"head": [], "middle": [], "tail": []}
    for r in rows:
        by_bucket[r["bucket"]].append(r["score_micronat"])
    assert by_bucket["head"] and by_bucket["tail"]
    # score-ordered partition: every head score < every middle score < tail
    if by_bucket["middle"]:
        assert max(by_bucket["head"]) < min(by_bucket["middle"])
        assert max(by_bucket["middle"]) < min(by_bucket["tail"])
    else:
        assert max(by_bucket["head"]) < min(by_bucket["tail"])
    # tercile rank arithmetic: head holds at least a third minus ties' width
    n = len(rows)
    assert len(by_bucket["head"]) >= n // 3 - 1


def test_boilerplate_bounds(spark, duck):
    rows = q_boilerplate(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_grams"]
        assert 0.0 <= r["boiler_frac"] <= 1.0
    assert_matches_oracle(
        q_boilerplate(spark, SF_DIR), duck, all_queries()["q_boilerplate"].oracle
    )


def test_neardup_apply_partitions_corpus(spark):
    from prefect_flow_arc_indexer_spark.operators.dedup import (
        q_dedup_components,
    )

    comp = q_dedup_components(spark, SF_DIR)
    n_components = comp.select("component_id").distinct().count()
    n_docs = comp.count()
    applied = all_queries()["q_neardup_apply"].builder(spark, SF_DIR)
    rows = applied.collect()
    # exactly one keeper per component, cluster sizes tile the corpus
    assert len(rows) == n_components
    assert sum(r["n_dups"] for r in rows) == n_docs


def test_bloom_decontaminate_matches_exact(spark):
    """The Bloom stage is pure physical optimization: per-doc shared-gram
    counts must equal the broadcast-exact q_decontaminate computation, and
    clean + contaminated must partition the train slice."""
    from prefect_flow_arc_indexer_spark.plans import all_queries
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table
    from tests.conftest import SF_DIR

    q = all_queries()
    bloom = {
        r["doc_id"]: (r["n_shared_ngrams"], r["is_clean"])
        for r in q["q_bloom_decontaminate"].builder(spark, SF_DIR).collect()
    }
    exact = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in q["q_decontaminate"].builder(spark, SF_DIR).collect()
    }
    assert exact, "fixture should contain contaminated docs"
    for doc_id, n in exact.items():
        assert bloom[doc_id] == (n, False)
    clean = {d for d, (n, ok) in bloom.items() if ok}
    assert clean == set(bloom) - set(exact)
    assert all(bloom[d][0] == 0 for d in clean)
    n_docs = (
        load_table(spark, SF_DIR, "documents")
        .where("text IS NOT NULL AND doc_id % 50 <> 0")
        .count()
    )
    assert len(bloom) == n_docs

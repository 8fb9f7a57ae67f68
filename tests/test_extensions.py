"""Training-data-pipeline extensions: dedup, similarity, text analysis,
sessionization, relational — oracle parity at sf0.001 plus semantic checks
(hash equality can't tell us the operators mean what they claim)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators import dedup, similarity
from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR
from tests.helpers import assert_matches_oracle

EXTENSIONS = [
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_ngram_jaccard",
    "q_dedup_embedding",
    "q_dedup_components",
    "q_train_split",
    "q_stratified_sample",
    "q_knn_cosine",
    "q_knn_lsh",
    "q_token_count",
    "q_text_quality",
    "q_lang_id",
    "q_doc_fingerprint",
    "q_session_window",
    "q_events_hourly",
    "q_pricing_summary",
    "q_market_revenue",
    "q_top_parts_by_supplier",
    "q_pii_pseudonymize",
    "q_repetition",
    "q_chunk_dedup",
    "q_tfidf_topterms",
    "q_inverted_index",
    "q_salted_token_counts",
    "q_ship_priority",
    "q_price_histogram",
    "q_embed_norm",
    "q_udtf_chunks",
    "q_small_qty_revenue",
    "q_grouping_sets",
    "q_unpivot",
]


@pytest.mark.parametrize("name", EXTENSIONS)
def test_oracle_parity(spark, duck, name):
    rq = all_queries()[name]
    assert_matches_oracle(rq.builder(spark, SF_DIR), duck, rq.oracle)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_catches_near_identical_docs(spark):
    """Two docs differing by one word must collide in >=1 LSH band."""
    base = " ".join(f"w{i}" for i in range(60))
    near = base.replace("w30", "x30")
    far = " ".join(f"z{i}" for i in range(60))
    docs = _docs(spark, [(1, base), (2, near), (3, far)])
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(
            dedup.minhash_signature(docs)
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_identical_docs_identical_signature(spark):
    docs = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    sigs = dedup.minhash_signature(docs).drop("doc_id").distinct()
    assert sigs.count() == 1


def test_train_split_proportions_and_determinism(spark):
    """Hash-split must (a) assign every doc exactly once, (b) land near
    80/10/10, (c) be identical across invocations (no rand())."""
    from prefect_flow_arc_indexer_spark.operators.sampling import q_train_split

    a = q_train_split(spark, SF_DIR).collect()
    b = q_train_split(spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = len(a)
    frac = {s: sum(1 for r in a if r.split == s) / n for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.8) < 0.08
    assert abs(frac["val"] - 0.1) < 0.06
    assert abs(frac["test"] - 0.1) < 0.06


def test_stratified_sample_subset_and_rate(spark):
    from prefect_flow_arc_indexer_spark.operators import sampling
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents")
    kept = sampling.stratified_sample(docs)
    assert kept.count() < docs.count()
    # sample ids are a subset of the corpus ids
    assert kept.join(docs, "doc_id", "left_anti").count() == 0


def test_connected_components_labels_transitive_closure(spark):
    """A chain 1-2-3 plus an island 4-5 must yield components {1,2,3}, {4,5};
    min-id labeling means comp ids are 1 and 4. A path graph also exercises
    pointer jumping (depth > 1)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "src long, dst long"
    )
    got = {
        (r.id, r.comp) for r in dedup.connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)}


def test_connected_components_long_path_converges(spark):
    """A 12-node path is the adversarial case for label propagation (max
    diameter); pointer jumping must still converge within CC_MAX_ITERS.
    driver_max_edges=0 pins the distributed loop (the default gate would
    route a graph this small through the driver union-find)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "src long, dst long"
    )
    labels = dedup.connected_components(edges, driver_max_edges=0).collect()
    assert {r.comp for r in labels} == {1}
    assert len(labels) == 12


def test_connected_components_raises_when_not_converged(spark):
    """Exhausting max_iters without reaching the sum(comp) fixpoint must be
    loud — silently returning partially-propagated labels would hand a
    high-diameter graph wrong clusters with no signal (ADVICE r1)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, max_iters=2, driver_max_edges=0)


def test_connected_components_driver_gate_parity(spark):
    """The r11 size gate routes broadcast-sized edge sets through a driver
    union-find; its labels must be IDENTICAL to the distributed loop's on
    the same graph (chains, a clique, islands, out-of-order edges)."""
    raw = (
        [(i, i + 1) for i in range(1, 9)]          # chain 1..9
        + [(20, 21), (22, 21), (23, 20)]           # star-ish, reversed dirs
        + [(30, 31), (31, 32), (30, 32)]           # triangle
        + [(50, 40)]                               # island, dst < src
    )
    edges = spark.createDataFrame(raw, "src long, dst long")
    via_driver = {
        (r.id, r.comp)
        for r in dedup.connected_components(edges).collect()
    }
    via_loop = {
        (r.id, r.comp)
        for r in dedup.connected_components(
            edges, driver_max_edges=0
        ).collect()
    }
    assert via_driver == via_loop
    assert via_driver  # non-empty sanity
    # min-label contract spot-checks
    assert (40, 40) in via_driver and (50, 40) in via_driver
    assert (21, 20) in via_driver and (23, 20) in via_driver


def test_lang_id_null_text_matches_oracle(spark, tmp_path):
    """NULL text rows must canonicalize identically on both engines: the
    oracle coalesces stopword hits to 0 and predicts the first language
    alphabetically; the Spark side must not leak NULL through F.aggregate
    (ADVICE r1 — the sf fixtures happen to contain no NULL texts)."""
    import duckdb

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog", "a"),
            (2, None, "a"),
            (3, "der hund und die katze sind nicht hier", "b"),
        ],
        "doc_id long, text string, source string",
    )
    staged = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.parquet(staged)
    part = [str(p) for p in (tmp_path / "documents.parquet").glob("*.parquet")]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet({part!r})"
    )
    rq = all_queries()["q_lang_id"]
    # q_lang_id loads <sf_dir>/documents.parquet — point it at the stage dir
    assert_matches_oracle(rq.builder(spark, str(tmp_path)), con, rq.oracle)
    con.close()


def test_simhash_near_docs_low_hamming(spark):
    base = " ".join(f"w{i}" for i in range(60))
    near = base.replace("w30", "x30")
    far = " ".join(f"z{i}" for i in range(60))
    fps = {
        r.doc_id: r.simhash
        for r in dedup.simhash_fingerprints(
            _docs(spark, [(1, base), (2, near), (3, far)])
        ).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fps[1], fps[2]) < ham(fps[1], fps[3])
    assert ham(fps[1], fps[2]) <= 6


def test_knn_self_excluded_and_k_respected(spark):
    out = all_queries()["q_knn_cosine"].builder(spark, SF_DIR)
    rows = out.collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == similarity.TOP_K for v in per_q.values())


def test_lsh_topk_is_subset_of_bucket(spark):
    """Every LSH result must share its query's bucket (correct pruning)."""
    out = all_queries()["q_knn_lsh"].builder(spark, SF_DIR).collect()
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", similarity._bucket_expr("embedding").alias("bucket")
    )
    buckets = {r.vec_id: r.bucket for r in emb.collect()}
    assert all(buckets[r.query_id] == buckets[r.neighbor_id] for r in out)


def test_jaccard_bounds_and_blocking(spark):
    """Content blocking: every emitted pair shares its min-shingle-hash
    block (1-perm MinHash), is ordered, and carries a valid Jaccard."""
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    rows = all_queries()["q_ngram_jaccard"].builder(spark, SF_DIR).collect()
    assert rows, "min-hash blocking should surface at least one pair"
    assert all(0.0 < r.jaccard <= 1.0 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)
    docs = load_table(spark, SF_DIR, "documents")
    minsh = {
        r["doc_id"]: r["mh"]
        for r in dedup._hashed_shingles(docs)
        .groupBy("doc_id")
        .agg(F.min("h").alias("mh"))
        .collect()
    }
    assert all(minsh[r.doc_a] == minsh[r.doc_b] for r in rows)


def test_lang_id_prediction_space(spark):
    rows = all_queries()["q_lang_id"].builder(spark, SF_DIR).collect()
    assert {r.predicted_lang for r in rows} <= {"de", "en", "es", "fr", "zh"}


def test_session_window_gap_semantics(spark):
    """Spark merges an event exactly GAP after its predecessor (inclusive
    boundary — the oracle's gaps-and-islands SQL must use `> gap`, not
    `>= gap`, for its new-session flag); strictly-beyond-gap splits."""
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:29:59"),  # merges (< 30 min after previous)
        (1, "2024-01-01 00:59:59"),  # merges again
        (1, "2024-01-01 01:29:59.000001"),  # > gap -> new session
        (2, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:30:00"),  # exactly gap -> merges (inclusive)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .collect()
    )
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r["count"])
    assert sorted(per_user[1]) == [1, 3]
    assert sorted(per_user[2]) == [2]


def test_pricing_summary_plan_quality(spark):
    """Shipdate filter must be pushed to the parquet scan."""
    df = all_queries()["q_pricing_summary"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_market_revenue_uses_broadcast(spark):
    df = all_queries()["q_market_revenue"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_salted_counts_equal_plain_groupby(spark):
    """Salting must change ONLY the physical plan: two-stage salted counts
    equal a direct explode+groupBy count."""
    from prefect_flow_arc_indexer_spark.functions.textfns import tokens
    from prefect_flow_arc_indexer_spark.operators.textprep import (
        q_salted_token_counts,
    )

    got = {
        (r.term, r.occurrences)
        for r in q_salted_token_counts(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plain = {
        (r.term, r.occurrences)
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("occurrences"))
        .collect()
    }
    assert got == plain


def test_repetition_flags_degenerate_doc(spark, tmp_path):
    """A doc that is one bigram repeated must be flagged; a all-distinct doc
    must not."""
    from prefect_flow_arc_indexer_spark.operators.textprep import q_repetition

    docs = spark.createDataFrame(
        [
            (1, "spam ham " * 30, "a"),
            (2, " ".join(f"w{i}" for i in range(60)), "a"),
        ],
        "doc_id long, text string, source string",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in q_repetition(spark, str(tmp_path)).collect()}
    assert rows[1].repetitive and rows[1].top_bigram_frac > 0.4
    assert not rows[2].repetitive and rows[2].distinct_ratio == 1.0


def test_inverted_index_postings_sorted_and_capped(spark):
    from prefect_flow_arc_indexer_spark.operators.textprep import (
        POSTING_PREVIEW,
        q_inverted_index,
    )

    for r in q_inverted_index(spark, SF_DIR).collect():
        ids = [int(x) for x in r.posting_preview.split(",") if x]
        assert ids == sorted(ids)
        assert len(ids) <= POSTING_PREVIEW
        assert r.doc_freq >= len(ids) and r.occurrences >= r.doc_freq


def test_pii_pseudonymize_masks_and_is_deterministic(spark):
    from prefect_flow_arc_indexer_spark.operators.textprep import (
        q_pii_pseudonymize,
    )

    rows = q_pii_pseudonymize(spark, SF_DIR).collect()
    assert all(set(r.name_masked[1:]) <= {"*"} for r in rows)
    # same key -> same pseudonym on a re-run (deterministic, joinable)
    again = q_pii_pseudonymize(spark, SF_DIR).collect()
    assert {r.pseudo_id for r in rows} == {r.pseudo_id for r in again}
    assert len({r.pseudo_id for r in rows}) == len(rows)  # injective here


def test_connected_components_deep_chain(spark):
    """A path graph forces the adaptive loop past its plain-propagation
    warmup into pointer-jumped rounds, and the per-round localCheckpoint
    keeps the doubled-per-round lineage from exploding (a 40-chain OOMed
    the driver before the fix). Labels must be the global min id."""
    from prefect_flow_arc_indexer_spark.operators.dedup import (
        connected_components,
    )

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    rows = connected_components(edges, driver_max_edges=0).collect()
    assert len(rows) == n + 1
    assert all(r["comp"] == 0 for r in rows)

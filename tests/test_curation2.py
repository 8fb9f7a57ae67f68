"""Semantic tests for the second curation wave: winnowing pairs, the
MinHash estimator audit, class weights, and revenue autocorrelation."""

from __future__ import annotations

import math

from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR


def _run(name, spark, sf=SF_DIR):
    return all_queries()[name].builder(spark, sf)


def test_winnow_pairs_thresholds_and_symmetry(spark):
    from prefect_flow_arc_indexer_spark.operators.curation import (
        WINNOW_MIN_SHARED,
    )

    rows = _run("q_winnow_pairs", spark).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert r["n_shared"] >= WINNOW_MIN_SHARED
        assert 0.0 < r["overlap"] <= 1.0


def test_minhash_estimate_error_statistics(spark):
    """Estimates are k/16 grid values; the MEAN absolute error across
    candidate pairs stays within ~3 sigma of the 16-perm binomial bound
    (sd <= 0.125) — the property that justifies signature screening."""
    rows = _run("q_minhash_estimate", spark).collect()
    assert rows
    for r in rows:
        assert abs(r["est_jaccard"] * 16 - round(r["est_jaccard"] * 16)) < 1e-6
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 2e-6
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err < 3 * 0.125


def test_class_weights_formulas(spark):
    from prefect_flow_arc_indexer_spark.operators.curation import EFF_BETA

    rows = _run("q_class_weights", spark).collect()
    total = sum(r["n"] for r in rows)
    k = len(rows)
    assert total == 500
    for r in rows:
        assert abs(r["inv_weight"] - total / (k * r["n"])) < 5e-7
        assert (
            abs(r["eff_weight"] - (1 - EFF_BETA) / (1 - EFF_BETA ** r["n"]))
            < 5e-7
        )
    # weighted sample count is balanced: sum n_k * inv_weight == N
    assert abs(sum(r["n"] * r["inv_weight"] for r in rows) - total) < 1e-2


def test_revenue_acf_bounds_and_python_replay(spark):
    """|acf| <= 1 and the lag-1 value matches a pure-Python Pearson on the
    reconstructed zero-filled daily series."""
    from pyspark.sql import functions as F

    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    rows = {r["lag"]: r for r in _run("q_revenue_acf", spark).collect()}
    assert set(rows) == {1, 7, 30}
    for r in rows.values():
        assert -1.0 <= r["acf"] <= 1.0

    daily = {}
    for rec in (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
        .collect()
    ):
        daily[rec["day"]] = rec["cents"]
    lo, hi = min(daily), max(daily)
    series = []
    d = lo
    while d <= hi:
        series.append(daily.get(d, 0))
        d = d + __import__("datetime").timedelta(days=1)

    def pearson(lag):
        xs = series[lag:]
        ys = series[:-lag]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    for lag in (1, 7, 30):
        assert abs(rows[lag]["acf"] - pearson(lag)) < 1e-5
        assert rows[lag]["n_pairs"] == len(series) - lag


def test_ndcg_bounds_and_consistency_with_recall(spark):
    """ndcg in [0,1]; a query with full overlap IN ORDER has ndcg 1;
    n_overlap agrees with q_mrl_recall's n_hits (same approx/exact sets)."""
    ndcg = {r["query_id"]: r for r in _run("q_ndcg_eval", spark).collect()}
    recall = {r["query_id"]: r for r in _run("q_mrl_recall", spark).collect()}
    assert set(ndcg) == set(recall)
    for qid, r in ndcg.items():
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
        assert r["n_overlap"] == recall[qid]["n_hits"]
        # dcg = ndcg * idcg with idcg = sum_p (k-p+1)/log2(p+1) ~ 10.272
        idcg = sum((5 - p + 1) / math.log2(p + 1) for p in range(1, 6))
        assert abs(r["dcg"] - r["ndcg"] * idcg) < 1e-4
        if r["ndcg"] > 0.999999:
            assert r["n_overlap"] == recall[qid]["k_exact"]


def test_bitext_margin_cross_side_and_hubness_rule(spark):
    """Pairs cross label parity AND share an LSH bucket (the round-4
    candidate rule); margin equals the documented formula recomputed from
    the bucket-restricted candidate set (pure-Python replay on the top
    pairs)."""
    from prefect_flow_arc_indexer_spark.operators.similarity import (
        LSH_DIMS,
        MARGIN_K,
        MARGIN_TOP,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    rows = _run("q_bitext_margin", spark).collect()
    assert len(rows) == MARGIN_TOP
    margins = [r["margin"] for r in rows]
    assert margins == sorted(margins, reverse=True)

    emb = {
        r["vec_id"]: (r["label"], [float(x) for x in r["embedding"]])
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    def bucket(v):
        return sum(1 << i for i, d in enumerate(LSH_DIMS) if v[d] >= 0)

    for r in rows[:3]:
        la, va = emb[r["id_a"]]
        lb, vb = emb[r["id_b"]]
        assert la % 2 == 0 and lb % 2 == 1
        assert bucket(va) == bucket(vb)  # candidates share an LSH bucket

        def cos_u(x, y):
            d = sum(a * b for a, b in zip(x, y))
            nx = sum(a * a for a in x) ** 0.5
            ny = sum(b * b for b in y) ** 0.5
            return round(d / (nx * ny) * 1_000_000)

        # k-NN sums run over the bucket-restricted candidate pairs only
        side1 = [
            (i, v)
            for i, (l, v) in emb.items()
            if l % 2 == 1 and bucket(v) == bucket(va)
        ]
        side0 = [
            (i, v)
            for i, (l, v) in emb.items()
            if l % 2 == 0 and bucket(v) == bucket(vb)
        ]
        top_a = sorted(
            ((cos_u(va, v), -i) for i, v in side1), reverse=True
        )[:MARGIN_K]
        top_b = sorted(
            ((cos_u(v, vb), -i) for i, v in side0), reverse=True
        )[:MARGIN_K]
        sum_a = sum(c for c, _ in top_a)
        sum_b = sum(c for c, _ in top_b)
        c_u = cos_u(va, vb)
        expect = round(2.0 * MARGIN_K * c_u / (sum_a + sum_b), 6)
        assert abs(r["margin"] - expect) < 2e-6


def test_rank_fusion_two_pass_rank_is_exact(spark):
    """The distributed two-pass global rank must equal a driver-side
    row_number replay; RRF terms recompute exactly from the ranks."""
    from prefect_flow_arc_indexer_spark.operators.curation import (
        RRF_C,
        RRF_TOP,
    )

    rows = _run("q_rank_fusion", spark).collect()
    assert len(rows) == RRF_TOP
    scores = [r["rrf_nano"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        expect = sum(
            round(1_000_000_000.0 / (RRF_C + r[c]))
            for c in ("rank_tokens", "rank_distinct", "rank_avglen")
        )
        assert r["rrf_nano"] == expect
        for c in ("rank_tokens", "rank_distinct", "rank_avglen"):
            assert r[c] >= 1


def test_reembed_plan_accounts_for_every_diff_row(spark):
    """The plan partitions the diff exactly; 'embed' slice equals the
    added+changed verdict count; deletes never exceed removed rows."""
    plan = {r["action"]: r for r in _run("q_reembed_plan", spark).collect()}
    diff = _run("q_dataset_diff", spark).groupBy("status").count().collect()
    by_status = {r["status"]: r["count"] for r in diff}
    assert sum(r["n_docs"] for r in plan.values()) == sum(by_status.values())
    assert plan["embed"]["n_docs"] == by_status.get("added", 0) + by_status.get(
        "changed", 0
    )
    if "delete_vector" in plan:
        assert plan["delete_vector"]["n_docs"] <= by_status.get("removed", 0)
        assert (
            plan["delete_vector"]["n_with_vector"]
            == plan["delete_vector"]["n_docs"]
        )
    if "backfill" in plan:
        assert plan["backfill"]["n_with_vector"] == 0


def test_dedup_cascade_funnel_monotone_and_stagewise_consistent(spark):
    """corpus >= exact_kept >= near_kept; exact stage agrees with a
    pure-Python normalize+hash replay."""
    import hashlib
    import re

    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    rows = {r["stage"]: r["n_docs"] for r in _run("q_dedup_cascade", spark).collect()}
    assert set(rows) == {"corpus", "exact_kept", "near_kept"}
    assert rows["corpus"] >= rows["exact_kept"] >= rows["near_kept"] > 0

    texts = [
        r["text"]
        for r in load_table(spark, SF_DIR, "documents").collect()
        if r["text"] is not None
    ]
    norms = {
        hashlib.md5(
            re.sub("[^a-z0-9]+", " ", t.lower()).strip().encode()
        ).hexdigest()
        for t in texts
    }
    assert rows["corpus"] == len(texts)
    assert rows["exact_kept"] == len(norms)


def test_band_sweep_monotone_in_bands(spark):
    """More bands -> lower threshold -> candidate volume can only grow
    (every 4x4 candidate is also an 8x2 candidate is NOT generally true,
    but the 4x4 candidates of THIS signature are a superset of 2x8's:
    agreeing on an 8-perm band implies agreeing on both its 4-perm
    halves). Checks that containment direction plus threshold ordering."""
    rows = {r["scheme"]: r for r in _run("q_band_sweep", spark).collect()}
    assert set(rows) == {"2x8", "4x4", "8x2"}
    assert rows["2x8"]["threshold"] > rows["4x4"]["threshold"] > rows["8x2"]["threshold"]
    # band refinement: 2x8 agreement implies 4x4 agreement implies 8x2
    assert rows["2x8"]["n_candidates"] <= rows["4x4"]["n_candidates"]
    assert rows["4x4"]["n_candidates"] <= rows["8x2"]["n_candidates"]


def test_spearman_python_replay(spark):
    """rho recomputed from a pure-Python ranking of the same signals."""
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    row = _run("q_spearman", spark).collect()[0]
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    sigs = []
    for r in docs:
        toks = [t for t in (r["text"] or "").lower().split() if t]
        n = len(toks)
        avg = round(1_000_000.0 * sum(len(t) for t in toks) / n) if n else 0
        sigs.append((r["doc_id"], n, avg))
    ra = {
        d: i + 1
        for i, (d, *_ ) in enumerate(
            sorted(sigs, key=lambda s: (-s[1], s[0]))
        )
    }
    rb = {
        d: i + 1
        for i, (d, *_ ) in enumerate(
            sorted(sigs, key=lambda s: (-s[2], s[0]))
        )
    }
    n = len(sigs)
    sum_d2 = sum((ra[d] - rb[d]) ** 2 for d, *_ in sigs)
    assert row["n"] == n and row["sum_d2"] == sum_d2
    assert abs(row["rho"] - (1 - 6 * sum_d2 / (n * (n * n - 1)))) < 5e-7


def test_uncertainty_sample_is_boundary_closest(spark):
    """Selected docs have the globally smallest |z|; p_quality near 0.5."""
    from prefect_flow_arc_indexer_spark.operators.text_analysis import (
        UNCERTAIN_TOP,
    )

    sel = _run("q_uncertainty_sample", spark).collect()
    assert len(sel) == UNCERTAIN_TOP
    all_z = sorted(
        abs(r["z_centi_micro"])
        for r in _run("q_quality_logistic", spark).collect()
    )
    worst_sel = max(abs(r["z_centi_micro"]) for r in sel)
    assert worst_sel <= all_z[UNCERTAIN_TOP - 1] or worst_sel == all_z[
        UNCERTAIN_TOP - 1
    ]
    for r in sel:
        assert 0.0 <= r["p_quality"] <= 1.0


def test_confusion_matrix_partition_and_diagonal(spark):
    """Counts partition the corpus; recall shares sum to 1 per class;
    predicted classes come from the label alphabet."""
    rows = _run("q_confusion_matrix", spark).collect()
    assert sum(r["n"] for r in rows) == 500
    actuals = {r["actual"] for r in rows}
    by_actual = {}
    for r in rows:
        by_actual.setdefault(r["actual"], []).append(r)
        assert r["is_correct"] == (r["actual"] == r["predicted"])
        assert r["predicted"] in actuals
    for group in by_actual.values():
        assert abs(sum(g["recall_share"] for g in group) - 1.0) < 1e-4


def test_hash_embed_python_replay(spark):
    """nnz/l1/checksum recomputed from a pure-Python signed feature hash."""
    import hashlib
    from collections import defaultdict

    from prefect_flow_arc_indexer_spark.operators.curation import HE_DIM
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    def h28(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    got = {r["doc_id"]: r for r in _run("q_hash_embed", spark).collect()}
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).limit(30).collect()
    import re as _re

    for d in docs:
        toks = [
            t for t in _re.split(r"\s+", (d["text"] or "").lower()) if t
        ]
        vec = defaultdict(int)
        for t in toks:
            dim = h28("he:" + t) % HE_DIM
            vec[dim] += 1 if h28("hs:" + t) % 2 == 0 else -1
        r = got[d["doc_id"]]
        assert r["nnz"] == sum(1 for v in vec.values() if v != 0)
        assert r["l1_norm"] == sum(abs(v) for v in vec.values())
        assert r["checksum"] == sum(v * (k + 1) for k, v in vec.items())


def test_pit_labels_no_leakage(spark):
    """Every feature strictly predates the cutoff; every positive label
    has a purchase inside the horizon window; users first seen after the
    cutoff are absent."""
    import datetime

    from pyspark.sql import functions as F

    from prefect_flow_arc_indexer_spark.operators.feature_ops import (
        PIT_CUTOFF,
        PIT_HORIZON_DAYS,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    cutoff = datetime.datetime.fromisoformat(PIT_CUTOFF)
    horizon = cutoff + datetime.timedelta(days=PIT_HORIZON_DAYS)
    rows = {r["user_id"]: r for r in _run("q_pit_labels", spark).collect()}
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    first_seen, purch_in_window = {}, set()
    for e in ev:
        ts = e["ts"]
        first_seen[e["user_id"]] = min(
            first_seen.get(e["user_id"], ts), ts
        )
        if e["event_type"] == "purchase" and cutoff <= ts < horizon:
            purch_in_window.add(e["user_id"])
    for uid, r in rows.items():
        assert first_seen[uid] < cutoff
        assert (
            r["last_seen_us"]
            < int(cutoff.replace(tzinfo=None).timestamp() * 1_000_000) + 1
        )
        assert r["label"] == (uid in purch_in_window)
    for uid, fs in first_seen.items():
        if fs < cutoff:
            assert uid in rows


def test_target_encoding_loo_replay(spark):
    """Encoding replayed in pure Python: excludes own value, shrinks to
    the global mean; a category of one collapses to (m*mu)/m = mu."""
    from prefect_flow_arc_indexer_spark.operators.feature_ops import (
        TE_SMOOTH_M,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    ).collect()
    bal = {r["c_custkey"]: round(r["c_acctbal"] * 100) for r in cust}
    by_nat = {}
    for r in cust:
        by_nat.setdefault(r["c_nationkey"], []).append(bal[r["c_custkey"]])
    s_t = sum(bal.values())
    mu = s_t / len(bal)
    rows = _run("q_target_encoding", spark).collect()
    assert len(rows) == len(cust)
    for r in rows[:100]:
        vals = by_nat[r["c_nationkey"]]
        expect = (
            (sum(vals) - bal[r["c_custkey"]]) + TE_SMOOTH_M * mu
        ) / (len(vals) - 1 + TE_SMOOTH_M) / 100.0
        assert abs(r["nation_enc"] - expect) < 5e-6


def test_pair_features_label_consistency(spark):
    """Labels agree with q_minhash_verified's surviving pair set; features
    bounded; candidate grain matches q_dedup_minhash."""
    rows = _run("q_pair_features", spark).collect()
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in _run("q_dedup_minhash", spark).collect()
    }
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in _run("q_minhash_verified", spark).collect()
    }
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == cand
    for r in rows:
        assert 0 <= r["len_ratio_u"] <= 1_000_000
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["label"] == ((r["doc_a"], r["doc_b"]) in verified)


def test_dim_variance_python_replay(spark):
    """Per-dim mean/variance recomputed from the quantized vectors."""
    from prefect_flow_arc_indexer_spark.operators.curation import DEAD_VAR
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    vecs = [
        [round(float(x) * 1_000_000) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    ]
    rows = {r["dim"]: r for r in _run("q_dim_variance", spark).collect()}
    assert set(rows) == set(range(64))
    n = len(vecs)
    for dim in (0, 7, 31, 63):
        us = [v[dim] for v in vecs]
        mean = sum(us) / n / 1_000_000
        var = sum(u * u for u in us) / n / 1e12 - mean * mean
        r = rows[dim]
        assert abs(r["mean_v"] - mean) < 5e-6
        assert abs(r["var_v"] - var) < 5e-6
        assert r["is_dead"] == (round(var, 6) < DEAD_VAR)


def test_kfold_partition_and_determinism(spark):
    from prefect_flow_arc_indexer_spark.operators.curation import KFOLDS

    a = sorted(
        (r["fold"], r["n_docs"], r["total_tokens"])
        for r in _run("q_kfold", spark).collect()
    )
    b = sorted(
        (r["fold"], r["n_docs"], r["total_tokens"])
        for r in _run("q_kfold", spark).collect()
    )
    assert a == b  # reproducible assignment
    assert len(a) <= KFOLDS
    assert sum(n for _, n, _ in a) == 500


def test_dup_quality_crosstab_accounts_for_corpus(spark):
    rows = _run("q_dup_quality", spark).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert abs(r["keep_rate"] - r["n_kept"] / r["n_docs"]) < 5e-7


def test_gini_python_replay(spark):
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    row = _run("q_gini", spark).collect()[0]
    xs = sorted(
        len([t for t in (r["text"] or "").lower().split() if t])
        for r in load_table(spark, SF_DIR, "documents").collect()
    )
    n = len(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    expect = 2.0 * s1 / (n * sum(xs)) - (n + 1.0) / n
    assert row["n"] == n and row["total_tokens"] == sum(xs)
    assert abs(row["gini"] - expect) < 5e-6
    assert 0.0 <= row["gini"] < 1.0

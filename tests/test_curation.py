"""Semantic tests for the curation wave: normalization, winnowing,
preference pairs, contrastive-batch audit, embedding outliers, and the
k-center coreset.

Each test pins the property the oracle comparison alone cannot see — and
``q_coreset_kcenter`` (rows-only, iterative) is pinned by a full pure-Python
replay of the greedy farthest-first traversal.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR


def _run(name, spark, sf=SF_DIR):
    return all_queries()[name].builder(spark, sf)


def test_text_normalize_matches_python_recompute(spark):
    """norm_hash is md5 of the casefold/strip/collapse normal form; changed
    is exactly (norm != raw)."""
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    raw = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = _run("q_text_normalize", spark).collect()
    assert len(rows) == len(raw)
    for r in rows[:50]:
        text = raw[r["doc_id"]]
        norm = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
        assert r["norm_hash"] == hashlib.md5(norm.encode()).hexdigest()
        assert r["changed"] == (norm != text)
        assert r["len_norm"] == len(norm)


def test_winnowing_invariants_and_guarantee(spark):
    """Per-doc: 1 <= n_fps <= n_windows, density exact, min<=max; and the
    winnowing GUARANTEE — two docs sharing a substring of length >= K+W-1
    share at least one selected fingerprint — verified by a pure-Python
    replay on a handful of docs."""
    from prefect_flow_arc_indexer_spark.operators.curation import (
        WINNOW_K,
        WINNOW_W,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    rows = _run("q_winnowing", spark).collect()
    for r in rows:
        if r["n_windows"] == 0:
            assert r["n_fps"] == 0 and r["density"] is None
            continue
        assert 1 <= r["n_fps"] <= r["n_windows"]
        # density is rounded to 6dp at the query layer
        assert abs(r["density"] - r["n_fps"] / r["n_windows"]) <= 5e-7 + 1e-12
        assert r["min_fp"] <= r["max_fp"]

    def replay(text: str) -> set[int]:
        k, w = WINNOW_K, WINNOW_W
        n = len(text)
        if n < k:
            return set()
        h = [
            int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:7], 16)
            for i in range(n - k + 1)
        ]
        n_windows = max(len(h) - w + 1, 1)
        return {min(h[j : j + w]) for j in range(n_windows)}

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .limit(5)
        .collect()
    )
    got = {r["doc_id"]: r for r in rows}
    for d in docs:
        fps = replay(d["text"])
        r = got[d["doc_id"]]
        assert r["n_fps"] == len(fps)
        if fps:
            assert r["min_fp"] == min(fps) and r["max_fp"] == max(fps)
    # guarantee: a doc always shares a fingerprint with itself extended —
    # two synthetic texts sharing a K+W-1 char window overlap in replay
    shared = "abcdefghijk"  # K+W-1 = 11 chars
    a, b = replay("xx" + shared + "yy"), replay("qq" + shared + "zz")
    assert a & b


def test_preference_pairs_margin_and_extremes(spark):
    """chosen/rejected are the true per-user max/min purchase values with
    the documented event_id tie-break; margins strictly positive."""
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    by_user: dict[int, list[tuple[float, int]]] = {}
    for r in (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "value")
        .collect()
    ):
        by_user.setdefault(r["user_id"], []).append(
            (r["value"], r["event_id"])
        )
    rows = _run("q_preference_pairs", spark).collect()
    seen = set()
    for r in rows:
        evs = by_user[r["user_id"]]
        chosen = max(evs, key=lambda t: (t[0], -t[1]))
        rejected = min(evs, key=lambda t: (t[0], t[1]))
        assert r["chosen_event"] == chosen[1]
        assert r["rejected_event"] == rejected[1]
        assert r["margin"] > 0
        seen.add(r["user_id"])
    # users whose purchases are all equal-valued are excluded, others kept
    for uid, evs in by_user.items():
        vals = {v for v, _ in evs}
        assert (uid in seen) == (len(vals) > 1)


def test_contrastive_batches_partition_and_rates(spark):
    from prefect_flow_arc_indexer_spark.operators.curation import N_BATCHES

    rows = _run("q_contrastive_batches", spark).collect()
    assert len(rows) <= N_BATCHES
    assert sum(r["batch_size"] for r in rows) == 500
    for r in rows:
        max_pairs = r["batch_size"] * (r["batch_size"] - 1) // 2
        assert 0 <= r["dup_label_pairs"] <= max_pairs
        assert 0.0 <= r["collision_rate"] <= 1.0
        assert r["n_labels"] <= r["batch_size"]


def test_embed_outliers_cosine_range_and_flag(spark):
    from prefect_flow_arc_indexer_spark.operators.curation import (
        OUTLIER_COS_MICRO,
        QUANT,
    )

    rows = _run("q_embed_outliers", spark).collect()
    assert len(rows) == 500
    for r in rows:
        assert -1.0 - 1e-9 <= r["cos_centroid"] <= 1.0 + 1e-9
        assert r["is_outlier"] == (
            round(r["cos_centroid"] * QUANT) < OUTLIER_COS_MICRO
        )


def test_coreset_kcenter_pure_python_replay(spark):
    """Full replay: greedy farthest-first traversal on the collected
    vectors must reproduce the selected ids and micro-unit radii exactly;
    radii are non-increasing (the k-center covering property)."""
    from prefect_flow_arc_indexer_spark.operators.curation import (
        CORESET_K,
        QUANT,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }

    def d2u(a, b):
        return round(sum((x - y) * (x - y) for x, y in zip(a, b)) * QUANT)

    seed = min(vecs)
    selected = [seed]
    expect = [(0, seed, 0)]
    for rnd in range(1, CORESET_K):
        best = None
        for vid, v in vecs.items():
            d = min(d2u(v, vecs[s]) for s in selected)
            key = (d, -vid)
            if best is None or key > best[0]:
                best = (key, vid, d)
        selected.append(best[1])
        expect.append((rnd, best[1], best[2]))

    rows = sorted(
        _run("q_coreset_kcenter", spark).collect(), key=lambda r: r["round"]
    )
    got = [(r["round"], r["vec_id"], r["radius_d2_micro"]) for r in rows]
    assert got == expect
    radii = [r for _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True)

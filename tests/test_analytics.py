"""Analytics / temporal / IVF / frame-sample operators: oracle parity at
sf0.001 plus semantic checks on the generic helpers (asof_join on constructed
data, IVF cell structure, frame-sample expansion arithmetic)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.operators.temporal import asof_join
from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR
from tests.helpers import assert_matches_oracle

NEW_QUERIES = [
    "q_set_ops",
    "q_rollup_revenue",
    "q_cube_revenue",
    "q_window_suite",
    "q_pivot_revenue",
    "q_percentiles",
    "q_asof_join",
    "q_range_join",
    "q_knn_ivf",
    "q_frame_sample",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_parity(spark, duck, name):
    rq = all_queries()[name]
    assert_matches_oracle(rq.builder(spark, SF_DIR), duck, rq.oracle)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    """Backward-looking inclusive as-of: equal timestamps match; earlier
    right rows are carried forward; left rows before any right row get
    NULL payload; keys never mix."""
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-05T00:00:00"), "l1"),  # after r@03 -> 30
            (1, _ts("2024-01-03T00:00:00"), "l2"),  # equal ts -> inclusive, 30
            (1, _ts("2024-01-01T00:00:00"), "l3"),  # before all -> NULL
            (2, _ts("2024-06-01T00:00:00"), "l4"),  # key 2 -> 99 not key 1's
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-02T00:00:00"), 20),
            (1, _ts("2024-01-03T00:00:00"), 30),
            (2, _ts("2024-05-01T00:00:00"), 99),
        ],
        "k long, t timestamp, payload int",
    )
    out = asof_join(
        left, right, left_key="k", right_key="k",
        left_ts="ts", right_ts="t", payload_cols=["payload"],
    )
    got = {r["tag"]: r["payload"] for r in out.collect()}
    assert got == {"l1": 30, "l2": 30, "l3": None, "l4": 99}


def test_asof_join_is_single_shuffle(spark):
    """The union-and-carry plan must not contain a join (the naive range-join
    formulation would); one exchange on the key is the whole cost."""
    left = spark.range(10).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 100).alias("ts"),
    )
    right = spark.range(5).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id")).alias("t"),
        F.lit(1).alias("payload"),
    )
    out = asof_join(
        left, right, left_key="k", right_key="k",
        left_ts="ts", right_ts="t", payload_cols=["payload"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_ivf_cells_partition_corpus(spark):
    """Every vector lands in exactly one cell, and cells equal the label set
    (label means are the centroids, so each label's vectors should mostly
    snap back to their own centroid on separable synthetic data)."""
    from prefect_flow_arc_indexer_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    cells = ivf_assign(e, ivf_centroids(e))
    n_vecs = e.count()
    assert cells.count() == n_vecs
    assert cells.select("vec_id").distinct().count() == n_vecs


def test_frame_sample_counts(spark):
    """Each video doc emits ceil(n_frames / stride) frames."""
    from prefect_flow_arc_indexer_spark.multimodal.binary import (
        FRAME_STRIDE,
        media_frame,
        sample_frames,
    )

    media = media_frame(spark, SF_DIR)
    videos = media.where(F.col("media_type") == "video/mp4")
    expected = (
        videos.select(
            (
                ((F.lit(1) + F.col("n_bytes") % 24) + (FRAME_STRIDE - 1))
                / FRAME_STRIDE
            )
            .cast("int")
            .alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sample_frames(media).count() == expected


@pytest.mark.parametrize("name", ["q_order_priority", "q_returned_top_customers"])
def test_relational_additions_parity(spark, duck, name):
    rq = all_queries()[name]
    assert_matches_oracle(rq.builder(spark, SF_DIR), duck, rq.oracle)


def test_approx_distinct_error_bound(spark):
    """HLL at rsd=0.01 should land within 2% of the exact count (no oracle:
    sketches are engine-specific; this is the semantic check instead)."""
    rows = (
        all_queries()["q_approx_distinct"].builder(spark, SF_DIR).collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx_customers"] - r["exact_customers"]) <= max(
            0.02 * r["exact_customers"], 1
        )


@pytest.mark.parametrize(
    "name",
    ["q_minhash_verified", "q_dedup_apply", "q_geomean_value", "q_knn_blocked"],
)
def test_second_wave_parity(spark, duck, name):
    rq = all_queries()[name]
    assert_matches_oracle(rq.builder(spark, SF_DIR), duck, rq.oracle)


def test_blocked_knn_equals_brute_force(spark):
    """The blocked-matmul path is exact: identical (query, neighbor, rank)
    set as the brute-force baseline."""
    qs = all_queries()
    brute = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in qs["q_knn_cosine"].builder(spark, SF_DIR).collect()
    }
    blocked = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in qs["q_knn_blocked"].builder(spark, SF_DIR).collect()
    }
    assert blocked == brute


def test_kmeans_deterministic_and_total(spark):
    """The iterative k-means is deterministic across runs (quantized
    arithmetic) and every vector stays assigned to exactly one cluster."""
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    rq = all_queries()["q_kmeans"]
    a = sorted(map(tuple, rq.builder(spark, SF_DIR).collect()))
    b = sorted(map(tuple, rq.builder(spark, SF_DIR).collect()))
    assert a == b
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r[1] for r in a) == n_vecs

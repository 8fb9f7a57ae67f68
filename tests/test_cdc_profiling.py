"""CDC-materialization and profiling operators: oracle parity at sf0.001
plus semantic checks on constructed data (snapshot compaction picks the true
latest row; SCD2 intervals tile each key's timeline; the calendar spine has
no holes; the rolling frame widens over gaps)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.plans import all_queries
from tests.conftest import SF_DIR
from tests.helpers import assert_matches_oracle

NEW_QUERIES = [
    "q_latest_snapshot",
    "q_scd2_intervals",
    "q_calendar_spine",
    "q_rolling_revenue",
    "q_corr_stats",
    "q_regex_features",
    "q_date_features",
    "q_array_profile",
    "q_decontaminate",
    "q_funnel",
    "q_retention",
    "q_char_entropy",
    "q_embed_quantize",
    "q_disjunctive_join",
    "q_salted_join",
    "q_mad",
    "q_window_edges",
    "q_fuzzy_match",
    "q_rank_suite",
    "q_string_agg",
    "q_regr_stats",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_parity(spark, duck, name):
    rq = all_queries()[name]
    assert_matches_oracle(rq.builder(spark, SF_DIR), duck, rq.oracle)


def test_latest_snapshot_one_row_per_key(spark):
    q = all_queries()["q_latest_snapshot"].builder(spark, SF_DIR)
    rows = q.collect()
    keys = [r["user_id"] for r in rows]
    assert len(keys) == len(set(keys)), "snapshot must be unique per key"
    # every snapshot ts is the max ts for its user (load_table, not raw
    # parquet: events carries nano timestamps that need the loader's
    # conversion — a raw read yields bigints that compare unequal)
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    ev = load_table(spark, SF_DIR, "events")
    maxes = {
        r["user_id"]: r["m"]
        for r in ev.groupBy("user_id").agg(F.max("ts").alias("m")).collect()
    }
    for r in rows:
        assert r["ts"] == maxes[r["user_id"]], (
            "snapshot must carry the key's LATEST event time"
        )


def test_scd2_intervals_tile_timeline(spark):
    """Per key: versions are 1..n, valid_from strictly increases, and each
    valid_to equals the next valid_from (half-open tiling, last one NULL)."""
    rows = (
        all_queries()["q_scd2_intervals"]
        .builder(spark, SF_DIR)
        .orderBy("user_id", "version")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, hist in by_user.items():
        assert [h["version"] for h in hist] == list(range(1, len(hist) + 1))
        for a, b in zip(hist, hist[1:]):
            assert a["valid_from"] < b["valid_from"]
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"], (
                "adjacent SCD2 versions must differ in the tracked attribute"
            )
        assert hist[-1]["valid_to"] is None


def test_calendar_spine_dense(spark):
    rows = (
        all_queries()["q_calendar_spine"]
        .builder(spark, SF_DIR)
        .orderBy("day")
        .collect()
    )
    days = [datetime.date.fromisoformat(r["day"]) for r in rows]
    assert (days[-1] - days[0]).days + 1 == len(days), "spine must be gapless"
    assert all(
        (b - a).days == 1 for a, b in zip(days, days[1:])
    ), "consecutive days"
    # zero-fill: empty days carry 0.0 revenue, not NULL
    assert all(r["revenue"] is not None and r["n_orders"] is not None for r in rows)


def test_rolling_revenue_frame_widens_over_gaps(spark):
    """RANGE frame on day numbers: construct a series with a hole and check
    the trailing-7d sum drops the aged-out day rather than sliding rows."""
    df = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 1), 0, 10.0),
            (datetime.date(2024, 1, 2), 1, 20.0),
            # gap of 8 days: both prior days age out of the 7-day frame
            (datetime.date(2024, 1, 10), 9, 40.0),
        ],
        "day date, day_num int, rev double",
    )
    from pyspark.sql import Window

    w = Window.orderBy("day_num").rangeBetween(-6, Window.currentRow)
    got = {
        r["day"]: r["s"]
        for r in df.select(
            "day", F.sum("rev").over(w).alias("s")
        ).collect()
    }
    assert got[datetime.date(2024, 1, 2)] == 30.0
    assert got[datetime.date(2024, 1, 10)] == 40.0, (
        "gap must age out old rows (ROWS frame would give 70.0)"
    )


def test_approx_percentiles_within_tolerance(spark):
    """Greenwald-Khanna with accuracy=10000 bounds RANK error at 0.01%;
    translate to a value tolerance by checking the approx quartiles land
    between the exact quantiles at ranks +/- 2*n/accuracy."""
    from prefect_flow_arc_indexer_spark.plans import all_queries

    rows = (
        all_queries()["q_approx_percentiles"]
        .builder(spark, SF_DIR)
        .collect()
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    for r in rows:
        flag, n = r["l_returnflag"], r["n"]
        vals = sorted(
            x["l_extendedprice"]
            for x in li.where(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        slack = max(2, 2 * n // 10000)
        quartiles = (r["approx_p25"], r["approx_p50"], r["approx_p75"])
        for q, approx in zip((0.25, 0.5, 0.75), quartiles):
            rank = int(q * (n - 1))
            lo = vals[max(0, rank - slack)]
            hi = vals[min(n - 1, rank + slack)]
            assert lo <= approx <= hi, (flag, q, approx, lo, hi)


def test_incremental_rollup_merges_both_sides(spark, duck):
    from prefect_flow_arc_indexer_spark.operators.cdc import (
        IVM_EXISTING_PCT,
        IVM_SALT,
        q_incremental_rollup,
    )
    from prefect_flow_arc_indexer_spark.operators.sampling import split_bucket
    from prefect_flow_arc_indexer_spark.plans.registry import all_queries
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR
    from tests.helpers import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    flag = split_bucket(F.col("doc_id"), IVM_SALT) < IVM_EXISTING_PCT
    n_existing = docs.where(flag).count()
    n_batch = docs.where(~flag).count()
    # the merge is only meaningful if both partials are non-trivial
    assert n_existing > 0 and n_batch > 0
    out = q_incremental_rollup(spark, SF_DIR)
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == n_existing + n_batch
    # IVM contract: merged partials == full recompute (the oracle)
    assert_matches_oracle(
        out, duck, all_queries()["q_incremental_rollup"].oracle
    )

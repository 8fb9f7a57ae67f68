"""Adversarial events robustness: event-touching queries keep exact oracle
parity on an events table containing NULL value, NULL event_type, NULL
user_id, NULL props, and a combined-NULL row (round-3 advisory: the null
sweep injected NULLs only into documents, so the q_preference_pairs
NULL-value ordering divergence stayed latent). Event TIME stays non-NULL —
NULL event-time is an ingest-reject in every window semantics this engine
exposes, and both engines would otherwise pick window membership for such
rows arbitrarily.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from prefect_flow_arc_indexer_spark.plans import all_queries
from prefect_flow_arc_indexer_spark.sources.parquet import TABLES
from tests.conftest import SF_DIR
from tests.helpers import signature

EVENT_QUERIES = [
    "q_preference_pairs",  # the advisory case: NULL-valued purchase
    "q_events_hourly",
    "q_session_window",
    "q_hopping_window",
    "q_funnel",
    "q_retention",
    "q_interarrival",
    "q_decayed_sum",
    "q_anomaly_zscore",
    "q_rolling_event_rate",
    "q_late_census",
    "q_gaps_islands",
    "q_window_edges",
    "q_watermark_compute",
    "q_abtest_lift",
    "q_ab_srm",
    "q_interval_join",
    "q_attribution",
    "q_rfm_segments",
    # round-5 sequence-mining additions
    "q_event_paths",
    "q_inter_event_gaps",
]


@pytest.fixture(scope="module")
def null_events_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_null_events")
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
  SELECT * FROM '{SF_DIR}/events.parquet'
  UNION ALL SELECT 900001, TIMESTAMP '2024-01-02 03:04:05', 3,
                   'purchase', NULL, '{{"k": 1}}'
  UNION ALL SELECT 900002, TIMESTAMP '2024-01-02 04:04:05', 4,
                   NULL, 12.5, '{{"k": 2}}'
  UNION ALL SELECT 900003, TIMESTAMP '2024-01-02 05:04:05', 5,
                   'view', 7.25, NULL
  UNION ALL SELECT 900004, TIMESTAMP '2024-01-02 06:04:05', NULL,
                   'purchase', 99.0, '{{"k": 4}}'
  UNION ALL SELECT 900005, TIMESTAMP '2024-01-02 07:04:05', 6,
                   NULL, NULL, NULL
) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        else:
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def null_events_duck(null_events_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{null_events_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_null_events_oracle_parity(spark, null_events_dir, null_events_duck, name):
    rq = all_queries()[name]
    assert rq.oracle is not None
    sdf = rq.builder(spark, null_events_dir)
    got = signature(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = null_events_duck.execute(rq.oracle)
    want = signature(
        [d[0] for d in res.description], [tuple(r) for r in res.fetchall()]
    )
    assert got == want, f"{name} diverges on NULL-bearing event rows"

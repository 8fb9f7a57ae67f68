"""Plan-hygiene gate for unpartitioned windows (VERDICT r4 task 2).

``scripts/explain_audit.py`` flags WindowExec nodes with an empty partition
spec over corpus-cardinality input. These tests pin the detector itself
(fires on a synthetic global window, exempts the sanctioned two-pass
``_pid`` offset pattern) and assert a zero flag count over the query family
the round-4 verdict called out — the four converted plans plus the
distrank consumers that already used the two-pass form.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import Window, functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from explain_audit import BOUNDED_GLOBAL_WINDOWS, unpartitioned_windows

from tests.conftest import SF_DIR

# The round-4 "weak" plans (now two-pass) plus existing distrank consumers:
# every one must plan with ZERO non-exempt unpartitioned windows.
MUST_BE_CLEAN = (
    "q_rfm_segments",
    "q_weighted_sample",
    "q_pack_sequences",
    "q_conformal_threshold",
    "q_rank_fusion",
    "q_spearman",
    "q_gini",
    "q_shard_balance",
)


def _globals_of(df) -> list[str]:
    return unpartitioned_windows(df._jdf.queryExecution().executedPlan())


def test_detector_fires_on_global_window(spark):
    df = spark.range(100).withColumn(
        "rk", F.row_number().over(Window.orderBy("id"))
    )
    assert len(_globals_of(df)) == 1


def test_detector_ignores_partitioned_window(spark):
    df = spark.range(100).withColumn("g", F.col("id") % 4)
    df = df.withColumn(
        "rk", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert _globals_of(df) == []


def test_detector_exempts_two_pass_offset_window(spark):
    from prefect_flow_arc_indexer_spark.operators.distrank import (
        global_rank,
    )

    df = global_rank(
        spark.range(1000).withColumn("v", F.col("id") % 7),
        [F.col("v").desc(), F.col("id").asc()],
    )
    # the only unpartitioned window is the _pid offset table — exempt
    assert _globals_of(df) == []


@pytest.mark.parametrize("name", MUST_BE_CLEAN)
def test_converted_plans_have_no_global_window(spark, name):
    from prefect_flow_arc_indexer_spark.plans import all_queries

    rq = all_queries()[name]
    flagged = _globals_of(rq.builder(spark, SF_DIR))
    assert flagged == [], f"{name} still plans a global window: {flagged}"


def test_allowlist_names_are_registered():
    from prefect_flow_arc_indexer_spark.plans import all_queries

    qs = all_queries()
    missing = [n for n in BOUNDED_GLOBAL_WINDOWS if n not in qs]
    assert missing == []
    # every allowlist entry must say WHY the input is bounded
    assert all(len(v) > 10 for v in BOUNDED_GLOBAL_WINDOWS.values())

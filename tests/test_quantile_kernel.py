"""Equivalence pins for the r12 exact-percentile NumPy replica
(functions/quantiles.py) and the grouped kernels built on it (q_mad,
q_percentiles): bit-identical to Spark's Percentile aggregate."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from prefect_flow_arc_indexer_spark.functions.quantiles import (
    spark_exact_percentile,
)

SF_DIR = "/root/testdata/sf0.001"


def _bits(x: float) -> bytes:
    return struct.pack("d", x)


@pytest.mark.parametrize("p", [0.25, 0.5, 0.75])
def test_replica_bitwise_matches_spark_percentile(spark, p):
    random.seed(int(p * 100))
    rows, cases = [], []
    for g in range(300):
        n = random.randint(1, 12)
        vals = [random.uniform(900.0, 105000.0) for _ in range(n)]
        cases.append(vals)
        rows += [(g, v) for v in vals]
    got = {
        r["g"]: r["p"]
        for r in spark.createDataFrame(rows, "g int, v double")
        .groupBy("g")
        .agg(F.percentile("v", p).alias("p"))
        .collect()
    }
    for g, vals in enumerate(cases):
        mine = spark_exact_percentile(
            np.sort(np.array(vals, dtype=np.float64)), p
        )
        assert _bits(mine) == _bits(got[g]), (g, mine, got[g])


def test_q_mad_matches_two_pass_aggregate(spark):
    """The one-pass kernel against the r11 two-pass percentile shape on
    the real small corpus (value-identical, pre-rounding semantics pinned
    by equal rounded output)."""
    from prefect_flow_arc_indexer_spark.plans import all_queries
    from prefect_flow_arc_indexer_spark.sources.parquet import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("m")
    )
    want = sorted(
        map(
            tuple,
            li.join(F.broadcast(med), "l_returnflag")
            .groupBy("l_returnflag")
            .agg(
                F.round(F.any_value("m"), 4).alias("median_price"),
                F.round(
                    F.percentile(
                        F.abs(F.col("l_extendedprice") - F.col("m")), 0.5
                    ),
                    4,
                ).alias("mad"),
            )
            .collect(),
        )
    )
    got = sorted(
        map(tuple, all_queries()["q_mad"].builder(spark, SF_DIR).collect())
    )
    assert got == want

"""User-defined aggregate surface: Arrow-batched Pandas UDAFs.

The reference exposes no UDF/UDAF surface (SURVEY §2.8 ABSENT); this module
demonstrates the engine's sanctioned extension point for aggregations the
built-ins lack — a ``pandas_udf`` GROUPED_AGG, which Spark executes as a
real aggregate (partial batches stream through Arrow; no collect, no
row-at-a-time Python). Rule of thumb stays: if an expression exists
JVM-side (this geometric mean could be ``exp(avg(ln(1+x)))``), prefer it;
the UDAF form is here to prove the plumbing with an oracle-checkable
function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table


# return type passed as a DataType instance (not a DDL string) so the module
# imports without an active SparkSession — DDL strings are parsed eagerly at
# decoration time and would make `queries()` require a session first.
@pandas_udf(DoubleType())
def geometric_mean_1p(v: pd.Series) -> float:
    """Geometric mean of (1 + v): exp(mean(log1p(v))). float64 end-to-end;
    the 1e-15-scale summation-order drift vs. the oracle is absorbed by the
    6-decimal rounding at the query layer."""
    return float(np.exp(np.log1p(v.to_numpy(dtype="float64")).mean()))


@register(
    "q_geomean_value",
    oracle="""SELECT event_type,
       round(exp(avg(ln(1 + value))), 6) AS geomean_value
  FROM events
 GROUP BY event_type
""",
    doc="custom UDAF: per-type geometric mean of event value via a "
    "pandas_udf GROUPED_AGG (Arrow-batched partial aggregation; the "
    "engine's UDAF extension point). Spark disallows mixing pandas and "
    "built-in aggregates in one agg, so the UDAF stands alone here.",
)
def q_geomean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", fan_out=True)
    return ev.groupBy("event_type").agg(
        F.round(geometric_mean_1p("value"), 6).alias("geomean_value"),
    )

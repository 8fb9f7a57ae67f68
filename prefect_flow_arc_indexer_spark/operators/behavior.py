"""Behavioral analytics over the event stream: ordered funnels and cohort
retention — the query shapes an indexer's downstream consumers run against
what it publishes (ABSENT in the reference, which stops at count
reconciliation, ``flows/main_flow.py:216-257``).

Both are expressed so every exchange is keyed by ``user_id`` (or the tiny
cohort key): the per-user reductions co-partition across stages, so at
100 TB the plan is a chain of same-key hash aggregates/joins — AQE reuses
the partitioning and the only broadcast is the final small matrix.

- `q_funnel`: strictly-ordered signup → click → purchase funnel. Each
  stage's timestamp is the user's FIRST qualifying event AFTER the previous
  stage (min-over-filter, then join back — the decorrelated form of the
  "first event after X" correlated subquery). Wrong-order events never
  count: a click before signup doesn't open the click stage.
- `q_retention`: weekly cohort retention — users grouped by the week of
  their first event; for each later week they appear in, one (cohort,
  offset) cell. Cohort cardinality is |weeks|² at most: tiny output from a
  one-scan + two same-key shuffles plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table


@register(
    "q_funnel",
    oracle="""WITH s AS (
  SELECT user_id, min(ts) AS s_ts FROM events
   WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
    FROM events e JOIN s ON s.user_id = e.user_id
   WHERE e.event_type = 'click' AND e.ts >= s.s_ts
   GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
    FROM events e JOIN c ON c.user_id = e.user_id
   WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
   GROUP BY e.user_id
)
SELECT 1 AS stage, 'signup' AS stage_name, (SELECT count(*) FROM s) AS n_users
UNION ALL
SELECT 2, 'click_after_signup', (SELECT count(*) FROM c)
UNION ALL
SELECT 3, 'purchase_after_click', (SELECT count(*) FROM p)
""",
    doc="ordered funnel: signup -> first click after signup -> first "
    "purchase after that click; min-over-filter + same-key joins "
    "(decorrelated 'first event after X'), wrong-order events excluded",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    spark_counts = [
        s.agg(F.count("*").alias("n")).select(
            F.lit(1).alias("stage"),
            F.lit("signup").alias("stage_name"),
            F.col("n").alias("n_users"),
        ),
        c.agg(F.count("*").alias("n")).select(
            F.lit(2).alias("stage"),
            F.lit("click_after_signup").alias("stage_name"),
            F.col("n").alias("n_users"),
        ),
        p.agg(F.count("*").alias("n")).select(
            F.lit(3).alias("stage"),
            F.lit("purchase_after_click").alias("stage_name"),
            F.col("n").alias("n_users"),
        ),
    ]
    out = spark_counts[0]
    for piece in spark_counts[1:]:
        out = out.unionByName(piece)
    return out


@register(
    "q_retention",
    oracle="""WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_trunc('week', e.ts) AS DATE) AS active_week
    FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(datediff('day', cohort_week, active_week) / 7 AS BIGINT)
         AS week_offset,
       count(*) AS n_active_users
  FROM activity
 GROUP BY 1, 2
""",
    doc="weekly cohort retention: cohort = week of first event, one cell "
    "per (cohort, week offset) with active-user counts — one scan, two "
    "user-keyed shuffles, tiny |weeks|^2 output; cohort_week surfaced as "
    "ISO string for pandas-path date parity",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.to_date(F.date_trunc("week", "ts")).alias("active_week"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff("active_week", "cohort_week") / 7)
        .cast("long")
        .alias("week_offset"),
    ).agg(F.count("*").alias("n_active_users"))

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


# --------------------------------------------------------------------------
# last-touch attribution: purchase revenue credited to the preceding touch
# --------------------------------------------------------------------------
ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback
ATTR_TOUCHES = ("click", "view")


@register(
    "q_attribution",
    oracle=f"""WITH ordered AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER w AS touch_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS touch_tsu
    FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
attributed AS (
  SELECT CASE WHEN touch_type IS NOT NULL
               AND tsu - touch_tsu <= {ATTR_WINDOW_US}
              THEN touch_type ELSE 'direct' END AS channel,
         value
    FROM ordered
   WHERE event_type = 'purchase'
)
SELECT channel,
       count(*) AS n_purchases,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM attributed GROUP BY channel
""",
    doc="last-touch attribution: each purchase credits its revenue to the "
    "user's most recent preceding click/view within a 7-day lookback "
    "('direct' when none) — the standard marketing-attribution join, "
    "expressed as last-ignore-nulls over the per-user event order "
    "instead of a per-purchase correlated lookup: ONE shuffle on "
    "user_id, no self-join, no per-row subquery. At 100 TB the window "
    "runs inside each user partition (memory bounded by one user's "
    "events) and the channel rollup reduces map-side to |channels| rows. "
    "Ties in ts break by event_id, so the picked touch is engine-stable.",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    tsu = F.unix_micros("ts")
    is_touch = F.col("event_type").isin(*ATTR_TOUCHES)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        tsu.alias("tsu"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, tsu), ignorenulls=True)
        .over(w)
        .alias("touch_tsu"),
    )
    attributed = ordered.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_type").isNotNull()
            & (F.col("tsu") - F.col("touch_tsu") <= ATTR_WINDOW_US),
            F.col("touch_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "value",
    )
    return attributed.groupBy("channel").agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------------
# RFM segmentation: recency / frequency / monetary quintiles per user
# --------------------------------------------------------------------------
@register(
    "q_rfm_segments",
    oracle="""WITH base AS (
  SELECT user_id,
         epoch_us(max(ts)) AS recency_us,
         count(*) AS frequency,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(value AS DECIMAL(18,2)) END),
                       0) AS DOUBLE) AS monetary
    FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY recency_us, user_id) AS r_rk,
         row_number() OVER (ORDER BY frequency, user_id) AS f_rk,
         row_number() OVER (ORDER BY monetary, user_id) AS m_rk,
         count(*) OVER () AS n
    FROM base
),
scored AS (
  SELECT user_id, recency_us, frequency, monetary,
         CAST(5 * (r_rk - 1) // n + 1 AS INT) AS r_score,
         CAST(5 * (f_rk - 1) // n + 1 AS INT) AS f_score,
         CAST(5 * (m_rk - 1) // n + 1 AS INT) AS m_score
    FROM ranked
)
SELECT user_id, recency_us, frequency, monetary,
       r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
            ELSE 'regular' END AS segment
  FROM scored
""",
    doc="RFM segmentation: per user, recency (last event), frequency "
    "(event count) and monetary (decimal-exact purchase revenue) each "
    "scored into exact quintiles via integer rank arithmetic "
    "(5*(rank-1)/n + 1 — no float percentile drift), combined into the "
    "classic 111-555 RFM code plus a coarse lifecycle label. Ties break "
    "by user_id so scores are engine-stable. Scale: the user rollup is "
    "one map-side-combinable aggregation; the three global ranks over "
    "the USER table run in the two-pass repartitionByRange form "
    "(distrank.global_rank — parallel range sort + broadcast offsets), so "
    "no single-task window touches user-cardinality data; n is a "
    "broadcast scalar.",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefect_flow_arc_indexer_spark.operators.distrank import (
        global_rank,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    base = ev.groupBy("user_id").agg(
        F.unix_micros(F.max("ts")).alias("recency_us"),
        F.count("*").alias("frequency"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,2)"),
                )
            ),
            F.lit(0),
        )
        .cast("double")
        .alias("monetary"),
    ).localCheckpoint(eager=True)  # one events scan feeds n + 3 rank passes
    # integer FLOOR division on both engines (DuckDB //, Spark SQL `div`):
    # 5*(rank-1)/n as a double would CAST-round in DuckDB but truncate in
    # Spark — boundary users would land one quintile apart
    n_tot = base.agg(F.count(F.lit(1)).alias("n"))
    ranked = global_rank(
        base, [F.col("recency_us").asc(), F.col("user_id").asc()], "r_rk"
    )
    ranked = global_rank(
        ranked, [F.col("frequency").asc(), F.col("user_id").asc()], "f_rk"
    )
    ranked = global_rank(
        ranked, [F.col("monetary").asc(), F.col("user_id").asc()], "m_rk"
    )
    ranked = ranked.crossJoin(F.broadcast(n_tot))
    scored = ranked.select(
        "user_id",
        "recency_us",
        "frequency",
        "monetary",
        F.expr("cast(5 * (r_rk - 1) div n + 1 as int)").alias("r_score"),
        F.expr("cast(5 * (f_rk - 1) div n + 1 as int)").alias("f_score"),
        F.expr("cast(5 * (m_rk - 1) div n + 1 as int)").alias("m_score"),
    )
    return scored.select(
        "*",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).alias("rfm"),
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion"
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk")
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating"
        )
        .otherwise("regular")
        .alias("segment"),
    )

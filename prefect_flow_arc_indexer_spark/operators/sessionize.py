"""Event-time windowing over ``events`` — streaming-shaped semantics run in
batch (the reference's incremental sync is CDC-by-watermark, SURVEY §2.6;
these operators add the event-time window surface it lacks).

- `q_session_window`: per-user session windows with a 30-minute inactivity
  gap via Spark's native ``session_window`` aggregation. The DuckDB oracle
  replicates the semantics with gaps-and-islands SQL (lag -> boundary flag ->
  running sum), pinning down the boundary rule: an event exactly ``gap``
  after its predecessor MERGES into the session (Spark treats the session
  end ``last_event + gap`` as inclusive for the next event; verified by
  test_session_window_gap_semantics).
- `q_events_hourly`: tumbling 1-hour windows per event type (watermarked
  windowed agg in the streaming variant — see ``streaming/``).

Money-style double sums go through DECIMAL(18,2) so partial-aggregation
order can't produce float drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table

SESSION_GAP = "30 minutes"


@register(
    "q_session_window",
    oracle="""WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
    FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM sessions
 GROUP BY user_id, session_seq
""",
    doc="sessionization: per-user 30-min-gap session windows "
    "(session_window agg; oracle = gaps-and-islands SQL)",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_events_hourly",
    oracle="""SELECT event_type,
       epoch_us(date_trunc('hour', ts)) AS hour_start_us,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events
 GROUP BY event_type, date_trunc('hour', ts)
""",
    doc="tumbling 1-hour event-time windows per event type (batch form of "
    "the watermarked streaming agg in streaming/jobs.py)",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "event_type",
            F.unix_micros("window.start").alias("hour_start_us"),
            "n_events",
            "total_value",
        )
    )


RATE_WINDOW_SEC = 3600


@register(
    "q_rolling_event_rate",
    # floor() before the BIGINT cast: Spark's unix_timestamp TRUNCATES
    # sub-second micros while DuckDB's CAST(double AS BIGINT) ROUNDS —
    # an event at x.84s would order as x+1 on one engine and x on the
    # other, flipping RANGE-frame membership exactly at the 3600s edge
    # (surfaced by the sf0.1 sweep, invisible at sf0.01).
    oracle=f"""SELECT event_id, user_id,
       count(*) OVER (PARTITION BY user_id
                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN {RATE_WINDOW_SEC} PRECEDING
                                AND CURRENT ROW) AS events_last_hour
  FROM events
""",
    doc="sliding event rate: per user, events in the trailing hour via a "
    "RANGE frame over epoch seconds (value-based, so irregular event "
    "spacing is handled exactly — a ROWS frame would be wrong) — the "
    "rate-limiter / burst-detection feature; one shuffle on user_id, the "
    "frame scan is per-user-ordered and O(events in window) per row",
)
def q_rolling_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-RATE_WINDOW_SEC, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("events_last_hour"),
    )


HOP_WIDTH_US = 3600 * 1_000_000
HOP_SLIDE_US = 900 * 1_000_000
HOPS_PER_WINDOW = HOP_WIDTH_US // HOP_SLIDE_US  # 4


@register(
    "q_hopping_window",
    oracle=f"""SELECT CAST((epoch_us(ts) // {HOP_SLIDE_US}) * {HOP_SLIDE_US}
            - k.k * {HOP_SLIDE_US} AS BIGINT) AS win_start_us,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events, range({HOPS_PER_WINDOW}) k(k)
 GROUP BY 1, 2
""",
    doc="hopping (sliding) event-time windows: 1-hour width, 15-minute "
    "slide, per event type — each event lands in exactly width/slide = 4 "
    "windows. Spark's window(ts, width, slide) expands the assignment "
    "scan-side (a 4x row multiplier BEFORE one shuffle on (window, type)); "
    "the oracle replicates the epoch-aligned window math with a range() "
    "cross join. Batch form of the slide-width streaming agg; tumbling "
    "(q_events_hourly) is the slide == width special case.",
)
def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_micros("w.start").alias("win_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

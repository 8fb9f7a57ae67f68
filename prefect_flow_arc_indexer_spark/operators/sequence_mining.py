"""Event-sequence mining (round 5): ordered behavioral n-gram paths and
inter-event timing — the clickstream-analysis shapes (path mining, dwell
profiles) the sessionize/behavior families don't yet cover.

Determinism contract: every per-user event ordering is (ts, event_id) —
event_id is unique, so sequences are total-ordered and engine-stable;
Spark sorts collect_list(struct(ts, event_id, ...)) (struct comparison is
field-left-to-right), DuckDB uses list(... ORDER BY ts, event_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table

PATH_N = 3  # trigram paths
PATH_MIN_OCC = 3  # emit paths recurring at least this often


@register(
    "q_event_paths",
    oracle=f"""WITH seqs AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         list(event_type ORDER BY ts, event_id) AS seq
    FROM events
   WHERE user_id IS NOT NULL AND event_type IS NOT NULL
   GROUP BY user_id, CAST(ts AS DATE)
),
tri AS (
  SELECT user_id, day, unnest(
           CASE WHEN len(seq) >= {PATH_N} THEN
             list_transform(generate_series(1, len(seq) - {PATH_N - 1}),
                            i -> seq[i] || '>' || seq[i+1] || '>' || seq[i+2])
           ELSE [] END) AS path
    FROM seqs
)
SELECT path,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n_sessions
  FROM tri GROUP BY path HAVING count(*) >= {PATH_MIN_OCC}
""",
    doc=f"behavioral path mining: {PATH_N}-step event-type paths over each "
    "user-day's (ts, event_id)-ordered event sequence, with occurrence "
    "and session counts for every path recurring >= "
    f"{PATH_MIN_OCC} times — the clickstream flow table funnel design "
    "starts from. Sequences are built per (user, day) with an "
    "engine-stable total order (struct-sorted collect_list vs DuckDB's "
    "ordered list aggregate); the n-gram expansion is row-local "
    "higher-order functions, and the only corpus shuffles are the "
    "user-day rollup and the path-keyed count — output bounded by the "
    "repetition threshold, the q_repeated_ngrams discipline on the "
    "events axis. Sessions with fewer than "
    f"{PATH_N} events contribute nothing (guarded: Spark's sequence(1,0) "
    "is [1,0], not empty).",
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    seqs = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("seq")
    )
    seq = F.col("seq")
    tri_expr = F.when(
        F.size(seq) >= PATH_N,
        F.transform(
            F.sequence(F.lit(1), F.size(seq) - F.lit(PATH_N - 1)),
            lambda i: F.concat_ws(
                ">",
                F.element_at(seq, i),
                F.element_at(seq, i + F.lit(1)),
                F.element_at(seq, i + F.lit(2)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = seqs.select(
        "user_id", "day", F.explode(tri_expr).alias("path")
    )
    return (
        tri.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id", "day")
            .cast("bigint")
            .alias("n_sessions"),
        )
        .where(F.col("n_occurrences") >= PATH_MIN_OCC)
    )


@register(
    "q_inter_event_gaps",
    oracle="""WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events WHERE user_id IS NOT NULL
)
SELECT event_type,
       CAST(count(gap_us) AS BIGINT) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(sum(gap_us) // count(gap_us) AS BIGINT) AS mean_gap_us
  FROM gaps WHERE gap_us IS NOT NULL GROUP BY event_type
""",
    doc="inter-event timing profile: for each event type, the distribution "
    "floor (min/max/floor-mean, exact integer microseconds) of the gap "
    "since the user's PREVIOUS event of any type — the dwell-time table "
    "behind session-timeout tuning (q_session_window's gap constant) and "
    "bot detection (impossibly small gaps). The lag window is PARTITIONED "
    "by user (parallel, bounded state per user); gaps are integer "
    "microsecond differences so the rollup is order-proof; first events "
    "per user drop out identically on both engines (NULL lag).",
)
def q_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.expr("sum(gap_us) div count(gap_us)")
        .cast("bigint")
        .alias("mean_gap_us"),
    )

"""Feature-engineering operators over the event stream and the corpus —
the per-entity derived signals a training-data pipeline computes alongside
dedup/quality (ABSENT in the reference, which never aggregates per user):
activity islands, time-decayed values, dispersion-based outliers, and
source-mixture sampling weights.

Scale posture: every operator shuffles on the entity key exactly once (the
window sort IS the shuffle sort, later aggs reuse the partitioning), or on a
bounded key (sources: ~tens). Float outputs are rounded at the output
boundary only, from exact-integer or single-division inputs, so the DuckDB
oracle comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prefect_flow_arc_indexer_spark.functions.textfns import dd_tokens, tokens
from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table

EPOCH = "1970-01-01"
DECAY_K = 16  # events per user entering the decayed sum (newest first)
Z_MIN_EVENTS = 10
Z_CUT = 2.5
MIX_BUDGET = 0.3  # target corpus fraction for q_mixture_weights


@register(
    "q_gaps_islands",
    oracle=f"""WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE)) AS d
    FROM events
),
r AS (
  SELECT user_id, d,
         row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
    FROM days
),
isl AS (
  SELECT user_id, d - rn AS island, count(*) AS run_len
    FROM r GROUP BY user_id, d - rn
)
SELECT user_id,
       count(*) AS n_islands,
       max(run_len) AS longest_run,
       CAST(sum(run_len) AS BIGINT) AS active_days
  FROM isl GROUP BY user_id
""",
    doc="gaps-and-islands: consecutive-active-day runs per user via the "
    "day-number-minus-row-number trick — one shuffle on user_id (the "
    "window sort), the island and user rollups reuse it; all-integer "
    "arithmetic, no float drift",
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("d"),
    ).distinct()
    rn = days.withColumn(
        "rn", F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    )
    islands = rn.groupBy(
        "user_id", (F.col("d") - F.col("rn")).alias("island")
    ).agg(F.count("*").alias("run_len"))
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("run_len").alias("longest_run"),
        F.sum("run_len").alias("active_days"),
    )


@register(
    "q_decayed_sum",
    oracle=f"""WITH r AS (
  SELECT user_id, value, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id,
       round(sum(value * power(0.5, rn - 1)), 6) AS decayed_value,
       count(*) AS n_used
  FROM r WHERE rn <= {DECAY_K}
 GROUP BY user_id
""",
    doc=f"time-decayed feature: half-per-step decayed sum over each user's "
    f"latest {DECAY_K} events (recency rank from one user_id window sort; "
    "truncation keeps the weight series finite so the sum is "
    "reorder-tolerant at 6dp) — the batch form of a decaying user profile",
)
def q_decayed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = ev.select("user_id", "value", F.row_number().over(w).alias("rn"))
    return (
        r.where(F.col("rn") <= DECAY_K)
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.pow(F.lit(0.5), F.col("rn") - 1)), 6
            ).alias("decayed_value"),
            F.count("*").alias("n_used"),
        )
    )


@register(
    "q_anomaly_zscore",
    oracle=f"""WITH s AS (
  SELECT user_id, avg(value) AS m, stddev_samp(value) AS sd, count(*) AS n
    FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id,
       round((e.value - s.m) / s.sd, 6) AS z
  FROM events e JOIN s ON e.user_id = s.user_id
 WHERE s.n >= {Z_MIN_EVENTS} AND s.sd > 0
   AND abs(round((e.value - s.m) / s.sd, 6)) >= {Z_CUT}
""",
    doc=f"per-entity outlier flagging: events beyond |z| >= {Z_CUT} against "
    "their user's mean/stddev — stats and detail co-partition on user_id "
    "(one shuffle each side, same key), the z comparison runs on the "
    "6dp-rounded value so engine ulps can't flip a boundary row",
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.avg("value").alias("m"),
        F.stddev_samp("value").alias("sd"),
        F.count("*").alias("n"),
    )
    z = F.round((F.col("value") - F.col("m")) / F.col("sd"), 6)
    return (
        ev.join(s, "user_id")
        .where((F.col("n") >= Z_MIN_EVENTS) & (F.col("sd") > 0))
        .select("event_id", "user_id", z.alias("z"))
        .where(F.abs(F.col("z")) >= Z_CUT)
    )


@register(
    "q_mixture_weights",
    oracle=f"""WITH per AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len({dd_tokens("text")})) AS BIGINT) AS tokens
    FROM documents GROUP BY source
),
tot AS (
  SELECT sum(tokens) AS total_tokens, sum(sqrt(tokens)) AS sum_w FROM per
)
SELECT per.source, per.n_docs, per.tokens,
       round(sqrt(per.tokens) / tot.sum_w, 6) AS share,
       round(least(1.0, {MIX_BUDGET} * tot.total_tokens
                         * (sqrt(per.tokens) / tot.sum_w) / per.tokens),
             6) AS sample_rate
  FROM per, tot
""",
    doc=f"dataset mixture weights: per-source token totals -> sqrt-"
    "proportional target shares -> per-source sampling rate hitting a "
    f"{MIX_BUDGET:.0%}-of-corpus token budget (the rate table a weighted "
    "training-mix sampler consumes); token counts are exact integers, the "
    "two divisions round once at the output, and the 1-row totals frame "
    "broadcasts back over the per-source rows",
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("tokens"),
    )
    tot = per.agg(
        F.sum("tokens").alias("total_tokens"),
        F.sum(F.sqrt(F.col("tokens"))).alias("sum_w"),
    )
    share = F.sqrt(F.col("tokens")) / F.col("sum_w")
    rate = F.least(
        F.lit(1.0),
        F.lit(MIX_BUDGET) * F.col("total_tokens") * share / F.col("tokens"),
    )
    return (
        per.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.round(share, 6).alias("share"),
            F.round(rate, 6).alias("sample_rate"),
        )
    )


@register(
    "q_interarrival",
    oracle="""WITH gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id))
         // 1000000 AS gap_s
    FROM events
)
SELECT user_id,
       CAST(count(gap_s) AS BIGINT) AS n_gaps,
       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
       CAST(quantile_disc(gap_s, 0.5) AS BIGINT) AS median_gap_s,
       CAST(max(gap_s) AS BIGINT) AS max_gap_s
  FROM gaps WHERE gap_s IS NOT NULL
 GROUP BY user_id
""",
    doc="inter-arrival profile: per-user event gap statistics (min/median/"
    "max seconds) from one user_id window sort — the burstiness feature "
    "behind bot detection and session-gap tuning; all-integer seconds, "
    "discrete median so no interpolation drift",
)
def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer MICROsecond epochs: unix_timestamp() truncates to seconds
    # while DuckDB's epoch() rounds — micros are exact on both engines,
    # floor-divided to whole seconds identically
    epoch = F.unix_micros("ts")
    gaps = ev.select(
        "user_id",
        F.floor((epoch - F.lag(epoch).over(w)) / 1_000_000)
        .cast("long")
        .alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_s)")
        .cast("long")
        .alias("median_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


AB_SALT = "exp1:"
AB_CONV_VALUE = 150  # 'big purchase' conversion threshold (~45% of users)


@register(
    "q_abtest_lift",
    oracle=f"""WITH assign AS (
  SELECT user_id,
         CASE WHEN (CAST('0x' || substr(md5('{AB_SALT}' || CAST(user_id AS VARCHAR)), 1, 7) AS BIGINT) % 100) < 50
              THEN 'A' ELSE 'B' END AS grp,
         max(CASE WHEN event_type = 'purchase' AND value > 150
                  THEN 1 ELSE 0 END) AS conv
    FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
g AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(conv) AS BIGINT) AS conversions
    FROM assign GROUP BY grp
),
w AS (
  SELECT max(CASE WHEN grp = 'A' THEN n END) AS na,
         max(CASE WHEN grp = 'A' THEN conversions END) AS ca,
         max(CASE WHEN grp = 'B' THEN n END) AS nb,
         max(CASE WHEN grp = 'B' THEN conversions END) AS cb
    FROM g
)
SELECT na, ca, nb, cb,
       round(CAST(cb AS DOUBLE) / nb - CAST(ca AS DOUBLE) / na, 6) AS lift,
       round((CAST(cb AS DOUBLE) / nb - CAST(ca AS DOUBLE) / na)
             / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)), 6) AS z_score
  FROM w
""",
    doc="A/B experiment readout: users deterministically assigned to arms "
    "by the salted id hash (reproducible across runs and cluster sizes — "
    "the assignment IS the experiment's identity), per-user conversion "
    "collapsed first so heavy users can't double-count, then the "
    "two-proportion pooled z-test — all counts exact integers, the test "
    "statistic one rounded expression over a 2-row frame",
)
def q_abtest_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefect_flow_arc_indexer_spark.functions.hashing import stable_hash

    # a NULL user_id is unassignable — not part of the experiment (and the
    # engines disagree on which arm a NULL hash falls into)
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    bucket = (
        stable_hash(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string")))
        % 100
    )
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > AB_CONV_VALUE),
                1,
            ).otherwise(0)
        ).alias("conv"),
        F.first(F.when(bucket < 50, "A").otherwise("B")).alias("grp"),
    )
    g = assign.groupBy("grp").agg(
        F.count("*").alias("n"), F.sum("conv").cast("long").alias("conversions")
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == "A", F.col("conversions"))).alias("ca"),
        F.max(F.when(F.col("grp") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == "B", F.col("conversions"))).alias("cb"),
    )
    ra = F.col("ca").cast("double") / F.col("na")
    rb = F.col("cb").cast("double") / F.col("nb")
    pooled = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    se = F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return w.select(
        "na",
        "ca",
        "nb",
        "cb",
        F.round(rb - ra, 6).alias("lift"),
        F.round((rb - ra) / se, 6).alias("z_score"),
    )


# --------------------------------------------------------------------------
# mixture weights APPLIED: the sampled training mix
# --------------------------------------------------------------------------
MIX_SALT = "mix:"
MIX_BUCKETS = 10_000


def _register_mixture_apply():
    """Registered via a closure embedding the q_mixture_weights oracle so
    the sampled corpus stays in lockstep with the rate table it applies
    (same pattern as q_ivf_recall / q_neardup_apply)."""
    from prefect_flow_arc_indexer_spark.functions.hashing import (
        dd_stable_hash,
        stable_hash,
    )
    from prefect_flow_arc_indexer_spark.plans.registry import _REGISTRY

    rates_sql = _REGISTRY["q_mixture_weights"].oracle
    dd_hash = dd_stable_hash(f"concat('{MIX_SALT}', CAST(doc_id AS VARCHAR))")
    oracle = f"""WITH rates AS (SELECT * FROM ({rates_sql}))
SELECT d.doc_id, d.source,
       CAST({dd_hash} % {MIX_BUCKETS} AS BIGINT) AS bucket,
       ({dd_hash} % {MIX_BUCKETS}) < floor(r.sample_rate * {MIX_BUCKETS})
           AS keep
  FROM documents d JOIN rates r ON r.source = d.source
"""

    @register(
        "q_mixture_apply",
        oracle=oracle,
        doc="dataset mixture APPLIED: each document draws a deterministic "
        f"engine-stable 0-{MIX_BUCKETS - 1} bucket from its salted id hash "
        "and keeps iff bucket < floor(rate * buckets), where rate is its "
        "source's q_mixture_weights sampling rate — the actual sqrt-"
        "proportional training mix, reproducible run-to-run (rerunning "
        "keeps the SAME docs, the property that makes the mix resumable "
        "and auditable). The rate table is source-cardinality-bounded and "
        "broadcasts; the verdict is a shuffle-free projection over the "
        "scan. The rate enters integer bucket space through its 6dp-"
        "ROUNDED value, so the float sqrt can never flip a keep verdict "
        "between engines.",
    )
    def q_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
        rates = q_mixture_weights(spark, sf_dir).select(
            "source", "sample_rate"
        )
        docs = load_table(spark, sf_dir, "documents", fan_out=True).select(
            "doc_id", "source"
        )
        bucket = (
            stable_hash(
                F.concat(F.lit(MIX_SALT), F.col("doc_id").cast("string"))
            )
            % MIX_BUCKETS
        ).cast("bigint")
        return (
            docs.join(F.broadcast(rates), "source")
            .select(
                "doc_id",
                "source",
                bucket.alias("bucket"),
                (
                    bucket
                    < F.floor(F.col("sample_rate") * MIX_BUCKETS)
                ).alias("keep"),
            )
        )


_register_mixture_apply()


# --------------------------------------------------------------------------
# experiment guardrail: sample-ratio mismatch (SRM) chi-square
# --------------------------------------------------------------------------
SRM_EXPECTED_TREAT = 0.5  # designed treatment share


@register(
    "q_ab_srm",
    oracle=f"""WITH arms AS (
  SELECT DISTINCT user_id,
         (CAST('0x' || substr(md5('{AB_SALT}' || CAST(user_id AS VARCHAR)), 1, 7)
               AS BIGINT) % 100) < 50 AS is_treatment
    FROM events WHERE user_id IS NOT NULL
),
counts AS (
  SELECT CAST(sum(CASE WHEN is_treatment THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(sum(CASE WHEN is_treatment THEN 0 ELSE 1 END) AS BIGINT) AS n_c
    FROM arms
)
SELECT n_t, n_c, n_t + n_c AS n_total,
       round((n_t + n_c) * {SRM_EXPECTED_TREAT}, 6) AS expected_each,
       round(pow(n_t - (n_t + n_c) * {SRM_EXPECTED_TREAT}, 2)
               / ((n_t + n_c) * {SRM_EXPECTED_TREAT})
             + pow(n_c - (n_t + n_c) * {1 - SRM_EXPECTED_TREAT}, 2)
               / ((n_t + n_c) * {1 - SRM_EXPECTED_TREAT}), 6) AS chi2,
       (pow(n_t - (n_t + n_c) * {SRM_EXPECTED_TREAT}, 2)
          / ((n_t + n_c) * {SRM_EXPECTED_TREAT})
        + pow(n_c - (n_t + n_c) * {1 - SRM_EXPECTED_TREAT}, 2)
          / ((n_t + n_c) * {1 - SRM_EXPECTED_TREAT})) > 3.841 AS srm_alarm
  FROM counts
""",
    doc="experiment guardrail: sample-ratio mismatch — chi-square (1 df) of "
    "the realized arm split against the designed 50/50, alarming at the "
    "0.05 critical value (3.841). SRM is the first thing a trustworthy "
    "experimentation pipeline checks, BEFORE reading q_abtest_lift: a "
    "mismatched split means assignment or logging is broken and the lift "
    "is meaningless. Same deterministic salted-hash arms as the lift "
    "readout (shared salt constant, so the two queries can never test "
    "different populations); cost is one distinct-user aggregation.",
)
def q_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefect_flow_arc_indexer_spark.functions.hashing import stable_hash

    # NULL user_id: unassignable — Spark's NULL-skipping sums would drop it
    # from both arms while the oracle's CASE..ELSE counts it as control
    ev = load_table(spark, sf_dir, "events", fan_out=True).where(
        F.col("user_id").isNotNull()
    )
    arms = ev.select(
        "user_id",
        (
            stable_hash(
                F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))
            )
            % 100
            < 50
        ).alias("is_treatment"),
    ).distinct()
    counts = arms.agg(
        F.sum(F.col("is_treatment").cast("int")).cast("bigint").alias("n_t"),
        F.sum((~F.col("is_treatment")).cast("int"))
        .cast("bigint")
        .alias("n_c"),
    )
    n_total = F.col("n_t") + F.col("n_c")
    exp_t = n_total * SRM_EXPECTED_TREAT
    exp_c = n_total * (1 - SRM_EXPECTED_TREAT)
    chi2 = (
        F.pow(F.col("n_t") - exp_t, 2) / exp_t
        + F.pow(F.col("n_c") - exp_c, 2) / exp_c
    )
    return counts.select(
        "n_t",
        "n_c",
        n_total.alias("n_total"),
        F.round(exp_t, 6).alias("expected_each"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_alarm"),
    )


# --------------------------------------------------------------------------
# hashing-trick feature crosses: (nation x segment) -> fixed bucket space
# --------------------------------------------------------------------------
FX_BUCKETS = 64
FX_SALT = "fx:"


@register(
    "q_feature_hash",
    oracle=f"""WITH crossed AS (
  SELECT CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment AS cross_key
    FROM customer
),
bucketed AS (
  SELECT cross_key,
         CAST('0x' || substr(md5('{FX_SALT}' || cross_key), 1, 7) AS BIGINT)
           % {FX_BUCKETS} AS bucket
    FROM crossed
)
SELECT bucket,
       count(*) AS n_rows,
       CAST(count(DISTINCT cross_key) AS BIGINT) AS n_crosses,
       count(DISTINCT cross_key) > 1 AS has_collision,
       min(cross_key) AS example_cross
  FROM bucketed GROUP BY bucket
""",
    doc="the hashing trick for categorical feature crosses: "
    f"(nation x segment) hashed into a fixed {FX_BUCKETS}-bucket space — "
    "how a feature pipeline keeps unbounded-cardinality crosses at a "
    "fixed model width with no vocabulary build, no fit step, and no "
    "driver state. The census reports per-bucket load and collisions "
    "(the accuracy cost the bucket-count knob trades against width). "
    "Row-local salted hash, one bucket-keyed aggregation; the distinct "
    "count runs inside the bounded bucket space.",
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefect_flow_arc_indexer_spark.functions.hashing import stable_hash

    cust = load_table(spark, sf_dir, "customer")
    crossed = cust.select(
        F.concat(
            F.col("c_nationkey").cast("string"),
            F.lit("|"),
            F.col("c_mktsegment"),
        ).alias("cross_key")
    )
    bucketed = crossed.select(
        "cross_key",
        (
            stable_hash(F.concat(F.lit(FX_SALT), F.col("cross_key")))
            % FX_BUCKETS
        ).alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("cross_key").cast("bigint").alias("n_crosses"),
        (F.countDistinct("cross_key") > 1).alias("has_collision"),
        F.min("cross_key").alias("example_cross"),
    )


# --------------------------------------------------------------------------
# point-in-time-correct training-set construction (leakage-free labels)
# --------------------------------------------------------------------------
PIT_CUTOFF = "2024-04-01 00:00:00"
PIT_HORIZON_DAYS = 30


@register(
    "q_pit_labels",
    oracle=f"""WITH feats AS (
  SELECT user_id,
         count(*) AS n_events_before,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases_before,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents_before,
         max(epoch_us(ts)) AS last_seen_us
    FROM events WHERE ts < TIMESTAMP '{PIT_CUTOFF}'
   GROUP BY user_id
),
labels AS (
  SELECT DISTINCT user_id, true AS converted
    FROM events
   WHERE event_type = 'purchase'
     AND ts >= TIMESTAMP '{PIT_CUTOFF}'
     AND ts < TIMESTAMP '{PIT_CUTOFF}' + INTERVAL {PIT_HORIZON_DAYS} DAY
)
SELECT f.user_id, f.n_events_before, f.n_purchases_before,
       f.value_cents_before, f.last_seen_us,
       coalesce(l.converted, false) AS label
  FROM feats f LEFT JOIN labels l ON l.user_id = f.user_id
""",
    doc="point-in-time-correct training-set construction: features are "
    f"aggregated STRICTLY before the cutoff ({PIT_CUTOFF}), the label "
    f"(purchase within the next {PIT_HORIZON_DAYS} days) strictly after — "
    "the temporal-leakage discipline every supervised pipeline over event "
    "data needs (a feature computed past the cutoff would leak the "
    "label). Users first seen after the cutoff are excluded by "
    "construction (no features exist for them at decision time). One "
    "scan with the cutoff predicates pushed to parquet, two "
    "map-side-combined aggregations on user_id, one ids-only left join; "
    "value sums in exact integer cents.",
)
def q_pit_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(PIT_CUTOFF).cast("timestamp")
    horizon = F.lit(PIT_CUTOFF).cast("timestamp") + F.expr(
        f"INTERVAL {PIT_HORIZON_DAYS} DAY"
    )
    feats = (
        ev.where(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events_before"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases_before"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("value_cents_before"),
            F.max(F.unix_micros("ts")).alias("last_seen_us"),
        )
    )
    labels = (
        ev.where(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= cutoff)
            & (F.col("ts") < horizon)
        )
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(True))
    )
    return feats.join(labels, "user_id", "left").select(
        "user_id",
        "n_events_before",
        "n_purchases_before",
        "value_cents_before",
        "last_seen_us",
        F.coalesce("converted", F.lit(False)).alias("label"),
    )


# --------------------------------------------------------------------------
# leave-one-out target encoding (leakage-aware categorical feature)
# --------------------------------------------------------------------------
TE_SMOOTH_M = 10  # pseudo-count weight of the global prior


@register(
    "q_target_encoding",
    oracle=f"""WITH cents AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_u
    FROM customer
),
grp AS (
  SELECT c_nationkey,
         CAST(sum(bal_u) AS BIGINT) AS s_g,
         count(*) AS n_g
    FROM cents GROUP BY c_nationkey
),
gtot AS (
  SELECT CAST(sum(bal_u) AS BIGINT) AS s_t, count(*) AS n_t FROM cents
)
SELECT c.c_custkey, c.c_nationkey,
       round(
         (CAST(g.s_g - c.bal_u AS DOUBLE)
          + {TE_SMOOTH_M} * (CAST(gl.s_t AS DOUBLE) / gl.n_t))
         / (g.n_g - 1 + {TE_SMOOTH_M}) / 100.0, 6) AS nation_enc
  FROM cents c
  JOIN grp g ON g.c_nationkey = c.c_nationkey
  CROSS JOIN gtot gl
""",
    doc="leave-one-out target encoding of a categorical feature (nation -> "
    "account balance): each row's encoding excludes ITS OWN target value "
    "(the leakage guard that separates target encoding from a train-time "
    "oracle) and shrinks toward the global mean with a pseudo-count of "
    f"{TE_SMOOTH_M} (Micci-Barreca '01). Group sums are exact integer "
    "cents, so the per-row arithmetic is (bigint - bigint + m*mu) over "
    "one deterministic float chain — engines agree bit-for-bit. Scale "
    "shape: one map-side-combined group agg (bounded by the category "
    "cardinality), a broadcast join back, a 1-row global prior — "
    "encoding cost is scan cost.",
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_u"),
    )
    grp = cust.groupBy("c_nationkey").agg(
        F.sum("bal_u").cast("bigint").alias("s_g"),
        F.count("*").alias("n_g"),
    )
    glob = cust.agg(
        F.sum("bal_u").cast("bigint").alias("s_t"),
        F.count("*").alias("n_t"),
    )
    mu = F.col("s_t").cast("double") / F.col("n_t")
    return (
        cust.join(F.broadcast(grp), "c_nationkey")
        .crossJoin(F.broadcast(glob))
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(
                (
                    (F.col("s_g") - F.col("bal_u")).cast("double")
                    + TE_SMOOTH_M * mu
                )
                / (F.col("n_g") - 1 + TE_SMOOTH_M)
                / 100.0,
                6,
            ).alias("nation_enc"),
        )
    )

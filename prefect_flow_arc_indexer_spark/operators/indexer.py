"""The reference's SQL surface, Spark-first (SURVEY §2.1-§2.3, §2.5).

Covers the seven SQL statements the reference issues against Postgres
(reference ``flows/main_flow.py:67,120,153,235,317,335,575``) plus the
scalar-function surface (P2/P8/P9/P10). Everything is a declarative DataFrame
plan: predicates and the 4-column projection reach the parquet scan
(PushedFilters / ReadSchema), aggregations are partial-then-final hash aggs,
and nothing leaves the JVM.

Shared literals: the incremental watermark and the IN-list of target indexes
are fixed so the DuckDB oracle can embed the identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import (
    IDX_DOCS_CTE,
    index_documents,
    load_table,
)

# Inclusive CDC watermark (reference semantics: `updated_at >= last_modified`,
# flows/main_flow.py:322 — note >=, not >). Mid-range for the test window.
WATERMARK = "2024-01-15 00:00:00"

# The `or_ids`-style target list (reference flows/main_flow.py:321,339).
TARGET_INDEXES = ("click", "purchase", "signup")

PROBE_INDEX = "click"

_IN_LIST = ", ".join(f"'{x}'" for x in TARGET_INDEXES)


@register(
    "q_distinct_indexes",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT DISTINCT "index" FROM index_documents WHERE "index" IS NOT NULL
""",
    doc="A1: SELECT DISTINCT index WHERE index IS NOT NULL "
    "(reference flows/main_flow.py:120-125)",
)
def q_distinct_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        index_documents(spark, sf_dir)
        .where(F.col("index").isNotNull())
        .select("index")
        .distinct()
    )


@register(
    "q_index_order",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT "index", count(id) AS doc_count
  FROM index_documents
 WHERE "index" IN ({_IN_LIST})
 GROUP BY "index"
 ORDER BY doc_count ASC, "index" ASC
""",
    doc="A2+O1: size-ordered work queue — GROUP BY index ORDER BY count ASC "
    "(reference flows/main_flow.py:153-160). Flagship query.",
)
def q_index_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        index_documents(spark, sf_dir)
        .where(F.col("index").isin(*TARGET_INDEXES))
        .groupBy("index")
        .agg(F.count("id").alias("doc_count"))
        .orderBy(F.col("doc_count").asc(), F.col("index").asc())
    )


@register(
    "q_count_active",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT count(id) AS active_count
  FROM index_documents
 WHERE "index" = '{PROBE_INDEX}' AND NOT is_deleted
""",
    doc="A3: live-doc count per index (reference flows/main_flow.py:235-248)",
)
def q_count_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        index_documents(spark, sf_dir)
        .where((F.col("index") == PROBE_INDEX) & ~F.col("is_deleted"))
        .agg(F.count("id").alias("active_count"))
    )


@register(
    "q_count_updated",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT count(id) AS updated_count
  FROM index_documents
 WHERE "index" = '{PROBE_INDEX}' AND updated_at >= TIMESTAMP '{WATERMARK}'
""",
    doc="A4: changed-rows count gating skip-if-zero "
    "(reference flows/main_flow.py:575-581); inclusive >= watermark (T2)",
)
def q_count_updated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        index_documents(spark, sf_dir)
        .where(
            (F.col("index") == PROBE_INDEX)
            & (F.col("updated_at") >= F.lit(WATERMARK).cast("timestamp"))
        )
        .agg(F.count("id").alias("updated_count"))
    )


@register(
    "q_full_select",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT "index", id, document, is_deleted
  FROM index_documents
 WHERE "index" IN ({_IN_LIST}) AND NOT is_deleted
""",
    doc="S1+P1/P4/P5: full-sync scan — 4-col projection, IN + NOT is_deleted "
    "(reference flows/main_flow.py:335-348)",
)
def q_full_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        index_documents(spark, sf_dir)
        .where(F.col("index").isin(*TARGET_INDEXES) & ~F.col("is_deleted"))
        .select("index", "id", "document", "is_deleted")
    )


@register(
    "q_incremental_select",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT "index", id, document, is_deleted
  FROM index_documents
 WHERE "index" IN ({_IN_LIST}) AND updated_at >= TIMESTAMP '{WATERMARK}'
""",
    doc="S2+P7: incremental scan, tombstones included, inclusive watermark "
    "(reference flows/main_flow.py:316-333)",
)
def q_incremental_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        index_documents(spark, sf_dir)
        .where(
            F.col("index").isin(*TARGET_INDEXES)
            & (F.col("updated_at") >= F.lit(WATERMARK).cast("timestamp"))
        )
        .select("index", "id", "document", "is_deleted")
    )


@register(
    "q_json_extract",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT id, json_extract_string(document, '$.k') AS schema_name
  FROM index_documents
 WHERE "index" = '{PROBE_INDEX}'
""",
    doc="P2: JSONB path extraction document->'..'->>'..' "
    "(reference flows/main_flow.py:69); '$.k' plays schema_maintainer.schema_name",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        index_documents(spark, sf_dir)
        .where(F.col("index") == PROBE_INDEX)
        .select(
            "id",
            F.get_json_object("document", "$.k").alias("schema_name"),
        )
    )


@register(
    "q_lower_ids",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT DISTINCT lower("index") AS or_id
  FROM index_documents
 WHERE "index" IS NOT NULL
""",
    doc="P8: or_id lowercasing (reference flows/main_flow.py:640)",
)
def q_lower_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        index_documents(spark, sf_dir)
        .where(F.col("index").isNotNull())
        .select(F.lower("index").alias("or_id"))
        .distinct()
    )


@register(
    "q_index_name",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT id,
       concat("index", '_', strftime(updated_at, '%Y-%m-%dt%H.%M.%S')) AS index_generation
  FROM index_documents
 WHERE "index" IN ({_IN_LIST})
""",
    doc="P9: index-generation naming f'{index}_{ts}' with the reference's "
    "'%Y-%m-%dt%H.%M.%S' format (reference flows/main_flow.py:182,647)",
)
def q_index_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        index_documents(spark, sf_dir)
        .where(F.col("index").isin(*TARGET_INDEXES))
        .select(
            "id",
            F.concat_ws(
                "_",
                "index",
                F.date_format("updated_at", "yyyy-MM-dd't'HH.mm.ss"),
            ).alias("index_generation"),
        )
    )


@register(
    "q_doc_charlen",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT id, length(document) AS doc_chars
  FROM index_documents
 WHERE "index" = '{PROBE_INDEX}'
""",
    doc="P10: document payload char length (len(json.dumps(..)) probe, "
    "reference flows/main_flow.py:372-376)",
)
def q_doc_charlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        index_documents(spark, sf_dir)
        .where(F.col("index") == PROBE_INDEX)
        .select("id", F.length("document").alias("doc_chars"))
    )


@register(
    "q_cdc_merge",
    oracle=f"""WITH latest_old AS (
  SELECT user_id, event_id, ts, props
    FROM (SELECT user_id, event_id, ts, props,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '{WATERMARK}') x
   WHERE rn = 1 AND event_id % 13 <> 0
),
batch_latest AS (
  SELECT user_id, event_id, ts, props, (event_id % 13 = 0) AS is_deleted
    FROM (SELECT user_id, event_id, ts, props,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '{WATERMARK}') x
   WHERE rn = 1
)
SELECT o.user_id, o.event_id, o.ts, o.props
  FROM latest_old o ANTI JOIN batch_latest b ON o.user_id = b.user_id
UNION ALL
SELECT user_id, event_id, ts, props
  FROM batch_latest WHERE NOT is_deleted
""",
    doc="the reference's core semantic as ONE oracle-gated query: CDC merge "
    "of an incremental batch into the prior snapshot — last-writer-wins per "
    "key inside the batch, untouched keys carried over (left anti), "
    "tombstones dropping their key (reference delete propagation, "
    "flows/main_flow.py:378-395; same dataflow as pipeline/runner.py's "
    "incremental_sync, here keyed by user_id so keys genuinely collide). "
    "Both window passes share a (user_id, ts) sort shape; the anti join is "
    "key-partitioned — nothing driver-side, nothing quadratic",
)
def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wm = F.lit(WATERMARK).cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.select(
                "user_id",
                "event_id",
                "ts",
                "props",
                F.row_number().over(w).alias("rn"),
            )
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    snapshot = latest(ev.where(F.col("ts") < wm)).where(
        F.col("event_id") % 13 != 0
    )
    batch = latest(ev.where(F.col("ts") >= wm)).withColumn(
        "is_deleted", F.col("event_id") % 13 == 0
    )
    carried = snapshot.join(
        batch.select("user_id"), "user_id", "left_anti"
    )
    applied = batch.where(~F.col("is_deleted")).drop("is_deleted")
    return carried.unionByName(applied)


@register(
    "q_variant_stats",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT "index",
       count(*) AS n_docs,
       count(TRY_CAST(json_extract_string(document, '$.k') AS BIGINT)) AS n_with_k,
       CAST(sum(TRY_CAST(json_extract_string(document, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(TRY_CAST(json_extract_string(document, '$.k') AS BIGINT)) AS max_k
  FROM index_documents
 GROUP BY "index"
""",
    doc="Spark 4 VARIANT over the reference's dynamic JSONB payload "
    "(flows/main_flow.py:319 selects the blob whole; :69 pokes one path "
    "with ->/->>): parse_json once into the typed binary VARIANT "
    "encoding, then try_variant_get per field — unlike per-path "
    "get_json_object calls, the document is PARSED ONCE regardless of "
    "how many fields are extracted, which is the 100 TB difference for "
    "wide extraction over big JSONB blobs. try_ semantics (NULL on "
    "missing/mistyped) are mirrored with TRY_CAST in the oracle — a hard "
    "CAST would abort DuckDB on a non-numeric payload where Spark "
    "NULLs; integer sums stay exact",
)
def q_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the VARIANT parse is the cost here, and the events source
    # reads as 1-4 partitions at test SFs — without the spread the parse
    # serializes onto that many cores (r11 sf1-ratio flag)
    docs = index_documents(spark, sf_dir, fan_out=True)
    v = F.parse_json("document")
    k = F.try_variant_get(v, "$.k", "long")
    return (
        docs.select("index", k.alias("k"))
        .groupBy("index")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "q_watermark_compute",
    oracle=f"""WITH {IDX_DOCS_CTE}
SELECT "index",
       max(updated_at) AS next_watermark,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN updated_at >= TIMESTAMP '{WATERMARK}'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(sum(CASE WHEN updated_at >= TIMESTAMP '{WATERMARK}'
                     AND is_deleted THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tombstones,
       sum(CASE WHEN updated_at >= TIMESTAMP '{WATERMARK}'
                THEN 1 ELSE 0 END) = 0 AS skip_batch
  FROM index_documents
 WHERE "index" IS NOT NULL
 GROUP BY "index"
""",
    doc="T1/T4 as a query: the per-index watermark state the reference "
    "persists between runs (save_last_run_config, flows/main_flow.py:7,"
    "603,611 — here max(updated_at), the honest high-water mark, rather "
    "than the flow-run wall clock) plus the skip-empty-batch gate "
    "(record_count == 0 -> continue, flows/main_flow.py:705-707) and the "
    "tombstone share of the pending batch (T3 routing volume). One "
    "map-side-combined aggregation per index — the bookkeeping query an "
    "incremental pipeline runs FIRST each cycle, at the cost of one "
    "narrow scan.",
)
def q_watermark_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = index_documents(spark, sf_dir).where(F.col("index").isNotNull())
    changed = F.when(
        F.col("updated_at") >= F.lit(WATERMARK).cast("timestamp"), 1
    ).otherwise(0)
    tomb = F.when(
        (F.col("updated_at") >= F.lit(WATERMARK).cast("timestamp"))
        & F.col("is_deleted"),
        1,
    ).otherwise(0)
    return docs.groupBy("index").agg(
        F.max("updated_at").alias("next_watermark"),
        F.count("*").alias("n_rows"),
        F.sum(changed).cast("bigint").alias("n_changed"),
        F.sum(tomb).cast("bigint").alias("n_tombstones"),
        (F.sum(changed) == 0).alias("skip_batch"),
    )


# --------------------------------------------------------------------------
# the full incremental cycle, fused into one plan (E2 end-to-end)
# --------------------------------------------------------------------------
@register(
    "q_sync_cycle",
    oracle=f"""WITH keyed AS (
  SELECT event_type AS idx, user_id AS key, ts, event_id,
         (event_id % 13 = 0) AS is_deleted
    FROM events
),
snap AS (
  SELECT idx, key, is_deleted
    FROM (SELECT *, row_number() OVER (PARTITION BY idx, key
                                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM keyed WHERE ts < TIMESTAMP '{WATERMARK}') x
   WHERE rn = 1
),
live_before AS (
  SELECT idx, count(*) AS n FROM snap WHERE NOT is_deleted GROUP BY idx
),
batch AS (
  SELECT idx, key, is_deleted
    FROM (SELECT *, row_number() OVER (PARTITION BY idx, key
                                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM keyed WHERE ts >= TIMESTAMP '{WATERMARK}') x
   WHERE rn = 1
),
pending AS (
  SELECT idx, count(*) AS n_pending,
         CAST(sum(CASE WHEN is_deleted THEN 0 ELSE 1 END) AS BIGINT) AS n_upserts,
         CAST(sum(CASE WHEN is_deleted THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
    FROM batch GROUP BY idx
),
carried AS (
  SELECT s.idx, count(*) AS n
    FROM snap s ANTI JOIN batch b ON s.idx = b.idx AND s.key = b.key
   WHERE NOT s.is_deleted GROUP BY s.idx
),
live_after AS (
  SELECT b.idx,
         coalesce(c.n, 0)
           + sum(CASE WHEN b.is_deleted THEN 0 ELSE 1 END) AS n
    FROM batch b LEFT JOIN carried c ON c.idx = b.idx
   GROUP BY b.idx, c.n
)
SELECT p.idx AS index_name,
       coalesce(lb.n, 0) AS live_before,
       p.n_pending, p.n_upserts, p.n_deletes,
       CAST(coalesce(la.n, 0) AS BIGINT) AS live_after,
       (p.n_pending = 0) AS skip_batch
  FROM pending p
  LEFT JOIN live_before lb ON lb.idx = p.idx
  LEFT JOIN live_after la ON la.idx = p.idx
""",
    doc="the reference's whole incremental cycle (E2: watermark predicate "
    "-> last-writer-wins batch compaction -> tombstone delete / upsert "
    "routing -> carry of untouched keys -> post-publish count "
    "reconciliation, flows/main_flow.py:316-333,378-395,559-600,216-257) "
    "fused into ONE plan keyed by (index, key): per index the live count "
    "before, the pending/upsert/delete breakdown, the live count the "
    "merged snapshot converges to, and the skip-empty-batch gate. Each "
    "compaction window runs exactly ONCE over its slice (the compacted "
    "narrow frames are materialized for their multiple censuses), the "
    "carry census shares one left join with the live_before count, and "
    "live_after is derived arithmetic (carried + upserts) — the whole "
    "cycle costs two corpus compactions and one key join, no driver "
    "loops.",
)
def q_sync_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.col("event_type").alias("idx"),
        F.col("user_id").alias("key"),
        "ts",
        "event_id",
        (F.col("event_id") % 13 == 0).alias("is_deleted"),
    )
    wm = F.lit(WATERMARK).cast("timestamp")
    w = Window.partitionBy("idx", "key").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    # Each compaction runs ONCE: the compacted frames are narrow
    # (idx, key, is_deleted) and are materialized so their multiple
    # censuses don't re-run the window over the corpus (without this,
    # Spark's plan paid FIVE corpus compactions — live_before, carried,
    # pending, applied, and the anti-join build each re-derived one).
    snap = (
        latest(keyed.where(F.col("ts") < wm))
        .select("idx", "key", "is_deleted")
        .localCheckpoint(eager=False)
    )
    batch = (
        latest(keyed.where(F.col("ts") >= wm))
        .select("idx", "key", "is_deleted")
        .localCheckpoint(eager=False)
    )
    pending = batch.groupBy("idx").agg(
        F.count("*").alias("n_pending"),
        F.sum(F.when(F.col("is_deleted"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_upserts"),
        F.sum(F.when(F.col("is_deleted"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_deletes"),
    )
    # live_before and the carry census from ONE pass over the live
    # snapshot: a left join flags keys touched by the batch, then a single
    # aggregation counts both (carried = untouched; live_after reuses
    # n_upserts rather than re-counting the batch)
    flagged = snap.where(~F.col("is_deleted")).join(
        batch.select("idx", "key", F.lit(1).alias("in_batch")),
        ["idx", "key"],
        "left",
    )
    before_carried = flagged.groupBy("idx").agg(
        F.count("*").alias("live_before"),
        F.sum(F.when(F.col("in_batch").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_carried"),
    )
    out = pending.join(before_carried, "idx", "left").select(
        F.col("idx").alias("index_name"),
        F.coalesce("live_before", F.lit(0)).alias("live_before"),
        "n_pending",
        "n_upserts",
        "n_deletes",
        (F.coalesce("n_carried", F.lit(0)) + F.col("n_upserts"))
        .cast("bigint")
        .alias("live_after"),
        (F.col("n_pending") == 0).alias("skip_batch"),
    )
    # caller-release contracts for the two compaction checkpoints (lazy:
    # materialized by the result's first action) — ADVICE r10's
    # naked-checkpoint class
    from prefect_flow_arc_indexer_spark.functions.caching import (
        CheckpointRelease,
    )

    out.ckpt_release = CheckpointRelease(snap)
    out.dn_release = CheckpointRelease(batch)
    return out

"""Data-profiling & feature-engineering scalar surface: statistical
aggregates, regex features, date-part features, grouped array building.

The reference's scalar vocabulary stops at lower()/concat/len
(`/root/reference/flows/main_flow.py:640,182,372` — SURVEY §2.2); a corpus
pipeline needs the profiling layer that decides WHAT to train on. All four
operators are single-pass built-in expressions (JVM-side, codegen) — no UDFs
anywhere, so they ride whole-stage codegen and scale linearly with the scan.

Cross-engine parity notes (each burned into the oracle):
- moment statistics (corr/covar/stddev) accumulate co-moments in partition
  order, so the last float bits differ between engines and runs — results
  are rounded to 6 decimals on BOTH sides, which absorbs merge-order noise
  (~1 ulp) without hiding real formula differences;
- Spark `dayofweek` is 1=Sunday, DuckDB's is 0=Sunday — the oracle shifts;
- DuckDB `regexp_replace` replaces the FIRST match unless given the 'g'
  flag; Spark always replaces all — the oracle passes 'g';
- array outputs are `array_sort`ed so set-valued results hash canonically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table


@register(
    "q_corr_stats",
    oracle="""SELECT l_returnflag,
       count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_covar,
       round(stddev_samp(l_extendedprice), 6) AS price_stddev,
       round(var_samp(l_quantity), 6) AS qty_var
  FROM lineitem
 GROUP BY l_returnflag
""",
    doc="moment statistics per group: corr, covar_samp, stddev_samp, "
    "var_samp in one hash-aggregate pass (partial co-moments merge "
    "map-side; rounded 6dp against merge-order float noise)",
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
    )


@register(
    "q_regex_features",
    oracle="""SELECT doc_id,
       regexp_extract(text, '[0-9]+') AS first_number,
       length(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
       length(regexp_extract_all(text, '[.!?]')) AS n_sentences,
       regexp_replace(text, '[0-9]', '#', 'g') AS masked
  FROM documents
 WHERE text IS NOT NULL
""",
    doc="regex feature extraction: first-match extract, match counting, "
    "global digit masking — all JVM regexp built-ins (no Python), one "
    "narrow projection over the scan",
)
def q_regex_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.regexp_extract("text", "[0-9]+", 0).alias("first_number"),
        F.regexp_count("text", F.lit("[A-Za-z]+")).alias("n_words"),
        F.regexp_count("text", F.lit("[.!?]")).alias("n_sentences"),
        F.regexp_replace("text", "[0-9]", "#").alias("masked"),
    )


@register(
    "q_date_features",
    oracle="""SELECT o_orderkey,
       year(o_orderdate) AS yr,
       quarter(o_orderdate) AS qtr,
       month(o_orderdate) AS mon,
       dayofmonth(o_orderdate) AS dom,
       dayofweek(o_orderdate) + 1 AS dow,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
  FROM orders
""",
    doc="calendar feature extraction: year/quarter/month/day parts, "
    "day-of-week (Spark 1=Sunday; oracle shifts DuckDB's 0-based), "
    "last_day, fixed-offset due date, month truncation — pure projection; "
    "date outputs surfaced as ISO strings for pandas-path date parity",
)
def q_date_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


@register(
    "q_array_profile",
    oracle="""SELECT source,
       count(*) AS n_docs,
       coalesce(array_to_string(
         list_sort(list(DISTINCT lang) FILTER (lang IS NOT NULL)), ','), '')
         AS langs,
       coalesce(list_sort(list(DISTINCT lang) FILTER (lang IS NOT NULL)), [])[1]
         AS first_lang,
       len(coalesce(list_sort(list(DISTINCT lang) FILTER (lang IS NOT NULL)), []))
         AS n_langs
  FROM documents
 GROUP BY source
""",
    doc="grouped array building: collect_set per group, canonicalized with "
    "array_sort so set semantics hash stably; element access and size "
    "exercise the array scalar surface. NULL langs are excluded on BOTH "
    "engines (Spark collect_set drops NULLs; DuckDB list() keeps them — "
    "the FILTER + coalesce aligns the all-NULL group to an empty array), "
    "and first_lang uses try_element_at so an empty set yields NULL "
    "instead of an ANSI index error. The set is surfaced comma-joined "
    "(scalar) because the driver's comparator sorts raw cells and ndarray "
    "cells are unhashable",
)
def q_array_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    langs = F.array_sort(F.collect_set("lang"))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.array_join(langs, ",").alias("langs"),
        F.try_element_at(langs, F.lit(1)).alias("first_lang"),
        F.size(langs).alias("n_langs"),
    )


FUZZY_MAX_DIST = 2

# Distinct-name gate between the two oracle-identical fuzzy plans: below
# it the plain (nation, segment)-blocked self-join is cheaper — its pair
# volume sum_b n_b^2/2 is ~3.6M banded-levenshtein probes at 30k names
# over the ~125 fixed blocks (sub-second JVM work), while the deletion-
# neighborhood path pays a fixed ~L^2/2-per-name variant explode + two
# persists regardless of size (measured +2.1 s at sf0.1's 15k names).
# Above it the blocked join's quadratic in-block growth takes over
# (measured 189 s at 150k names) and the variant path wins. Both plans
# produce the exact oracle result: the variant join yields a verified
# SUPERSET of candidates and the blocked join yields ALL in-block pairs,
# so the banded-levenshtein verify emits identical rows either way.
FUZZY_VARIANT_GATE = 30_000


class _NoopRelease:
    """Release-handle stand-in for plans that persisted nothing."""

    def release(self) -> None:
        return None


def deletion_variants():
    """All strings reachable from column ``name`` by deleting 0, 1, or 2
    characters (positions taken in the ORIGINAL string, i < j) — pure
    Catalyst array exprs, the FastSS/SymSpell neighborhood for d=2.

    Each deletion branch is gated on the name being long enough to delete
    from: Spark's ``sequence(a, b)`` evaluates DESCENDING when a > b, so
    an unguarded length-1 name turns the 2-deletion branch's
    ``sequence(2, 1)`` into ``[2, 1]`` and emits junk variants (empty
    names do the same to the 1-deletion branch) — harmless to correctness
    (the candidate set is a verified superset) but short names would all
    share a hot junk-variant block, reintroducing the quadratic candidate
    volume the blocking exists to avoid (ADVICE r8). The legitimate ''
    variant of length<=2 names is kept: it is what lets dist<=2 pairs of
    short names share a block (the superset guarantee needs it)."""
    return F.expr(
        """array_distinct(concat(
             array(name),
             CASE WHEN length(name) >= 1 THEN
               transform(sequence(1, length(name)), i ->
                 concat(substring(name, 1, i - 1),
                        substring(name, i + 1, length(name))))
             ELSE cast(array() AS array<string>) END,
             CASE WHEN length(name) >= 2 THEN
               flatten(transform(
                 sequence(1, length(name) - 1), i ->
                   transform(sequence(i + 1, length(name)), j ->
                     concat(substring(name, 1, i - 1),
                            substring(name, i + 1, j - i - 1),
                            substring(name, j + 1, length(name))))))
             ELSE cast(array() AS array<string>) END
           ))"""
    )


@register(
    "q_fuzzy_match",
    oracle=f"""SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       levenshtein(a.c_name, b.c_name) AS edit_dist
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
 WHERE levenshtein(a.c_name, b.c_name) <= {FUZZY_MAX_DIST}
""",
    doc="entity-resolution fuzzy match. The RESULT is the spec the oracle "
    "states (all same-nation+segment pairs within Levenshtein "
    f"{FUZZY_MAX_DIST}); the PLAN is deletion-neighborhood blocking "
    "(SymSpell / FastSS): every name emits its <=d-deletion variants "
    "(1 + L + C(L,2) strings), and dist(a,b) <= d guarantees the two "
    "names share at least one variant (each unit edit is absorbed by "
    "deleting one character from one side), so a hash self-join on "
    "(nation, segment, variant) yields a candidate SUPERSET that banded "
    "levenshtein then verifies exactly — output identical to the "
    "quadratic form at every SF. Why not block on (nation, segment) "
    "alone: that key is FIXED-cardinality, so in-block pairs grow "
    "quadratically with the corpus (measured 1.9 s -> 189 s for 10x "
    "data); variant blocks are content-derived and stay small because "
    "a variant retains the discriminating characters. Cost is linear: "
    "~L^2/2 variant rows per record through one shuffle, candidates "
    "only where real near-matches exist; scoring stays JVM banded "
    "levenshtein (threshold form, early exit), no UDF anywhere. Below "
    "FUZZY_VARIANT_GATE distinct names the plan takes the plain blocked "
    "self-join instead — oracle-identical output, and the variant "
    "explode's fixed cost dominates at that size (VERDICT r8 task 5).",
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from prefect_flow_arc_indexer_spark.operators.dedup import _CacheRelease

    # fan_out: variant generation is ~L^2/2 interpreted array ops per row,
    # and the single-row-group test files otherwise run it in ONE task
    cust = load_table(spark, sf_dir, "customer", fan_out=True).select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
    )
    # the expensive stages (variant explode + levenshtein verify) run on
    # DISTINCT names per block, not on rows: a duplicate-heavy corpus
    # (e.g. 10 exact copies of every name) otherwise multiplies candidate
    # pairs by the duplication factor squared for identical distance
    # results — dedupe-before-fuzzy is the standard ER decomposition.
    # Distinct names are persisted for the self-join's two reads.
    dn = (
        cust.select("nk", "seg", "name")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    release_dn = _CacheRelease(dn)
    # the count both picks the plan AND materializes the persist that
    # either branch reads twice — no wasted action (VERDICT r8 task 5)
    n_names = dn.count()
    if n_names <= FUZZY_VARIANT_GATE:
        # small corpus: plain blocked self-join, no variant explode
        b = dn.select(
            F.col("nk").alias("b_nk"), F.col("seg").alias("b_seg"),
            F.col("name").alias("name_b"),
        )
        name_cand = dn.join(
            b,
            (F.col("b_nk") == F.col("nk"))
            & (F.col("b_seg") == F.col("seg"))
            & (F.col("name_b") > F.col("name")),
        ).select("nk", "seg", F.col("name").alias("name_a"), "name_b")
        release_ex = _NoopRelease()
    else:
        variants = deletion_variants()
        # persist the exploded variant relation too: the variant self-join
        # reads it twice and the higher-order array lambdas run interpreted
        ex = dn.select(
            "nk", "seg", "name", F.explode(variants).alias("v")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        release_ex = _CacheRelease(ex)
        b = ex.select(
            F.col("nk").alias("b_nk"), F.col("seg").alias("b_seg"),
            F.col("name").alias("name_b"), F.col("v").alias("b_v"),
        )
        name_cand = (
            ex.join(
                b,
                (F.col("b_v") == F.col("v"))
                & (F.col("b_nk") == F.col("nk"))
                & (F.col("b_seg") == F.col("seg"))
                & (F.col("name_b") > F.col("name")),
            )
            .select("nk", "seg", F.col("name").alias("name_a"), "name_b")
            .distinct()
        )
    # threshold form: banded O(threshold * len) per pair with early exit
    # (returns -1 past the bound) instead of the full O(len^2) DP
    dist = F.levenshtein("name_a", "name_b", FUZZY_MAX_DIST)
    matched = name_cand.where(dist >= 0).select(
        "nk", "seg", "name_a", "name_b", dist.alias("edit_dist")
    )
    # expand name-level matches back to key pairs (distance depends only
    # on the names, so every key pair under a matched name pair inherits
    # its edit_dist verbatim) ...
    ka = cust.select(
        "nk", "seg", F.col("name").alias("name_a"),
        F.col("key").alias("k_a"),
    )
    kb = cust.select(
        F.col("nk").alias("nk2"), F.col("seg").alias("seg2"),
        F.col("name").alias("name_b2"), F.col("key").alias("k_b"),
    )
    cross = (
        matched.join(ka, ["nk", "seg", "name_a"])
        .join(
            kb,
            (F.col("nk2") == F.col("nk"))
            & (F.col("seg2") == F.col("seg"))
            & (F.col("name_b2") == F.col("name_b")),
        )
        .select(
            F.least("k_a", "k_b").alias("key_a"),
            F.greatest("k_a", "k_b").alias("key_b"),
            "edit_dist",
        )
    )
    # ... plus the distance-0 pairs between keys sharing one exact name
    same_b = cust.select(
        F.col("nk").alias("s_nk"), F.col("seg").alias("s_seg"),
        F.col("name").alias("s_name"), F.col("key").alias("key_b"),
    )
    same = cust.join(
        same_b,
        (F.col("s_nk") == F.col("nk"))
        & (F.col("s_seg") == F.col("seg"))
        & (F.col("s_name") == F.col("name"))
        & (F.col("key_b") > F.col("key")),
    ).select(
        F.col("key").alias("key_a"), "key_b",
        F.lit(0).alias("edit_dist"),
    )
    out = cross.unionByName(same)
    out.sig_release = release_ex
    out.dn_release = release_dn
    return out


@register(
    "q_regr_stats",
    oracle="""SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       regr_count(l_extendedprice, l_quantity) AS n_pairs
  FROM lineitem
 GROUP BY l_returnflag
""",
    doc="linear-regression aggregates: regr_slope / intercept / r2 / count "
    "per group in one hash-agg pass (co-moment partials merge map-side, "
    "like corr) — the cheap trend-fit a profiling pass runs before any "
    "modeling; rounded 6dp against merge-order float noise",
)
def q_regr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "slope"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
    )


# --------------------------------------------------------------------------
# declarative data-quality gate (Deequ-style)
# --------------------------------------------------------------------------
@register(
    "q_dq_checks",
    oracle="""WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS row_count,
         CAST(count(*) - count(o_orderkey) AS BIGINT) AS key_nulls,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS key_dups,
         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS nonpos_price,
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1
                       ELSE 0 END) AS BIGINT) AS bad_status,
         CAST(sum(CASE WHEN o_orderdate <  TIMESTAMP '1990-01-01 00:00:00'
                         OR o_orderdate >= TIMESTAMP '2005-01-01 00:00:00'
                       THEN 1 ELSE 0 END) AS BIGINT) AS date_out_of_range
    FROM orders
)
SELECT c.check_name, c.observed, c.passed FROM m, LATERAL (VALUES
  ('row_count_min_1',        m.row_count,         m.row_count >= 1),
  ('o_orderkey_complete',    m.key_nulls,         m.key_nulls = 0),
  ('o_orderkey_unique',      m.key_dups,          m.key_dups = 0),
  ('o_totalprice_positive',  m.nonpos_price,      m.nonpos_price = 0),
  ('o_orderstatus_in_set',   m.bad_status,        m.bad_status = 0),
  ('o_orderdate_in_range',   m.date_out_of_range, m.date_out_of_range = 0)
) AS c(check_name, observed, passed)
""",
    doc="declarative data-quality gate (Deequ-style): completeness, "
    "uniqueness, positivity, value-set and range constraints over orders, "
    "ALL metrics computed in ONE aggregation pass (one scan, one 1-row "
    "reduce — adding checks adds columns, not jobs), then unpivoted into "
    "(check, observed, passed) verdict rows — the generalization of the "
    "reference's count-reconciliation gate (flows/main_flow.py:216-257)",
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    lo = F.lit("1990-01-01 00:00:00").cast("timestamp")
    hi = F.lit("2005-01-01 00:00:00").cast("timestamp")
    m = o.agg(
        F.count("*").alias("row_count"),
        (F.count("*") - F.count("o_orderkey")).alias("key_nulls"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("key_dups"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).cast("long").alias("nonpos_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).cast("long").alias("bad_status"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < lo) | (F.col("o_orderdate") >= hi), 1
            ).otherwise(0)
        ).cast("long").alias("date_out_of_range"),
    )
    return m.selectExpr(
        """stack(6,
           'row_count_min_1',       row_count,         row_count >= 1,
           'o_orderkey_complete',   key_nulls,         key_nulls = 0,
           'o_orderkey_unique',     key_dups,          key_dups = 0,
           'o_totalprice_positive', nonpos_price,      nonpos_price = 0,
           'o_orderstatus_in_set',  bad_status,        bad_status = 0,
           'o_orderdate_in_range',  date_out_of_range, date_out_of_range = 0
        ) AS (check_name, observed, passed)"""
    )


# --------------------------------------------------------------------------
# mergeable moment statistics via exact power sums
# --------------------------------------------------------------------------
@register(
    "q_stats_merge",
    oracle="""WITH seg AS (
  SELECT o_orderpriority AS segment,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))
                  * CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS s2
    FROM orders GROUP BY o_orderpriority
),
allrow AS (
  SELECT 'ALL' AS segment, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(s) AS DECIMAL(38,2)) AS s,
         CAST(sum(s2) AS DECIMAL(38,4)) AS s2
    FROM seg
),
u AS (SELECT * FROM seg UNION ALL SELECT * FROM allrow)
SELECT segment, n,
       round(CAST(s AS DOUBLE) / n, 6) AS mean_price,
       round(sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / n) / (n - 1)), 6) AS sd_price
  FROM u
""",
    doc="mergeable moment statistics: per-segment (n, sum, sum-of-squares) "
    "power sums in EXACT decimal, merged into a global row by pure "
    "addition — the algebraic-aggregate-state pattern (same shape as the "
    "HLL merge, but exact) that lets 100 TB pipelines keep per-partition/"
    "per-day summaries and answer any rollup's mean/variance without "
    "rescanning; mean/stddev derive from the sums AFTER the merge (stddev "
    "rather than variance on the output: sqrt compresses the magnitude so "
    "6dp rounding sits far above decimal->double cast ulps)",
)
def q_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(18,2)")
    seg = o.groupBy(F.col("o_orderpriority").alias("segment")).agg(
        F.count("*").alias("n"),
        F.sum(p).cast("decimal(38,2)").alias("s"),
        F.sum(p * p).cast("decimal(38,4)").alias("s2"),
    )
    allrow = seg.agg(
        F.sum("n").alias("n"),
        F.sum("s").cast("decimal(38,2)").alias("s"),
        F.sum("s2").cast("decimal(38,4)").alias("s2"),
    ).select(F.lit("ALL").alias("segment"), "n", "s", "s2")
    u = seg.unionByName(allrow)
    sd, s2d = F.col("s").cast("double"), F.col("s2").cast("double")
    return u.select(
        "segment",
        "n",
        F.round(sd / F.col("n"), 6).alias("mean_price"),
        F.round(
            F.sqrt((s2d - sd * sd / F.col("n")) / (F.col("n") - 1)), 6
        ).alias("sd_price"),
    )


# --------------------------------------------------------------------------
# shuffle-skew diagnostics
# --------------------------------------------------------------------------
@register(
    "q_skew_metrics",
    oracle="""WITH per_key AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_orderkey
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(max(n) AS BIGINT) AS max_key_rows
    FROM per_key
),
top1 AS (
  SELECT l_orderkey AS hottest_key FROM per_key
   ORDER BY n DESC, l_orderkey ASC LIMIT 1
),
p AS (
  SELECT CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99_key_rows,
         CAST(quantile_disc(n, 0.50) AS BIGINT) AS p50_key_rows
    FROM per_key
)
SELECT tot.n_keys, tot.n_rows, tot.max_key_rows,
       top1.hottest_key, p.p50_key_rows, p.p99_key_rows,
       round(CAST(tot.max_key_rows AS DOUBLE) / tot.n_rows, 6)
           AS max_key_share,
       round(CAST(tot.max_key_rows AS DOUBLE) * tot.n_keys / tot.n_rows, 6)
           AS skew_factor
  FROM tot, top1, p
""",
    doc="shuffle-skew diagnostics for a join/agg key: per-key cardinality "
    "profile (max/p50/p99 key rows, hottest key, max-key share, skew "
    "factor = hottest/mean) — the pre-flight a 100 TB pipeline runs "
    "before shuffling on a key, deciding between a plain join, AQE skew "
    "splitting, or explicit salting (q_salted_join); one groupBy plus a "
    "constant-size summary",
)
def q_skew_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    tot = per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
    )
    top1 = (
        per_key.orderBy(F.col("n").desc(), F.col("l_orderkey").asc())
        .limit(1)
        .select(F.col("l_orderkey").alias("hottest_key"))
    )
    # exact discrete quantiles of the per-key counts: the count frame is
    # |keys|-bounded, far smaller than the fact table
    p = per_key.agg(
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY n)")
        .cast("long")
        .alias("p50_key_rows"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY n)")
        .cast("long")
        .alias("p99_key_rows"),
    )
    share = F.col("max_key_rows").cast("double") / F.col("n_rows")
    return (
        tot.join(F.broadcast(top1))
        .join(F.broadcast(p))
        .select(
            "n_keys",
            "n_rows",
            "max_key_rows",
            "hottest_key",
            "p50_key_rows",
            "p99_key_rows",
            F.round(share, 6).alias("max_key_share"),
            F.round(share * F.col("n_keys"), 6).alias("skew_factor"),
        )
    )


# --------------------------------------------------------------------------
# one-pass column profiler
# --------------------------------------------------------------------------
@register(
    "q_column_profile",
    oracle="""WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(o_custkey) AS BIGINT) AS nn_cust,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_cust,
         CAST(min(o_custkey) AS VARCHAR) AS min_cust,
         CAST(max(o_custkey) AS VARCHAR) AS max_cust,
         CAST(count(o_orderstatus) AS BIGINT) AS nn_status,
         CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_status,
         CAST(min(o_orderstatus) AS VARCHAR) AS min_status,
         CAST(max(o_orderstatus) AS VARCHAR) AS max_status,
         CAST(count(o_totalprice) AS BIGINT) AS nn_price,
         CAST(count(DISTINCT o_totalprice) AS BIGINT) AS nd_price,
         CAST(round(min(o_totalprice), 2) AS VARCHAR) AS min_price,
         CAST(round(max(o_totalprice), 2) AS VARCHAR) AS max_price
    FROM orders
)
SELECT c.col_name, m.n AS n_rows, c.n_nonnull, c.n_distinct,
       c.min_value, c.max_value
  FROM m, LATERAL (VALUES
    ('o_custkey',     m.nn_cust,   m.nd_cust,   m.min_cust,   m.max_cust),
    ('o_orderstatus', m.nn_status, m.nd_status, m.min_status, m.max_status),
    ('o_totalprice',  m.nn_price,  m.nd_price,  m.min_price,  m.max_price)
  ) AS c(col_name, n_nonnull, n_distinct, min_value, max_value)
""",
    doc="one-pass column profiler: per-column non-null/distinct counts and "
    "min/max (stringified across types) for a table, ALL columns profiled "
    "in a single scan + single aggregate (the describe/ANALYZE-statistics "
    "shape), unpivoted to one verdict row per column — adding columns "
    "adds agg expressions, never extra scans",
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # r12 (guide §2.4): the plain folds and the distinct counts run as two
    # SEPARATE aggregations joined as 1-row relations. In one aggregate,
    # the multi-distinct rewrite's Expand branches share the plan with the
    # string min/max, whose variable-width buffers force SortAggregate —
    # i.e. a full Sort of the 4x-expanded corpus. Split, the fold side is
    # a keyless single pass (no sort, no Expand) and the distinct side's
    # count-only buffers hash-aggregate, partial-reducing each Expand
    # branch to its distinct values before the exchange. Same rows.
    plain = o.agg(
        F.count("*").alias("n"),
        F.count("o_custkey").alias("nn_cust"),
        F.min("o_custkey").cast("string").alias("min_cust"),
        F.max("o_custkey").cast("string").alias("max_cust"),
        F.count("o_orderstatus").alias("nn_status"),
        F.min("o_orderstatus").cast("string").alias("min_status"),
        F.max("o_orderstatus").cast("string").alias("max_status"),
        F.count("o_totalprice").alias("nn_price"),
        F.round(F.min("o_totalprice"), 2).cast("string").alias("min_price"),
        F.round(F.max("o_totalprice"), 2).cast("string").alias("max_price"),
    )
    nd = o.agg(
        F.count_distinct("o_custkey").alias("nd_cust"),
        F.count_distinct("o_orderstatus").alias("nd_status"),
        F.count_distinct("o_totalprice").alias("nd_price"),
    )
    m = plain.crossJoin(nd)
    return m.selectExpr(
        "n AS n_rows",
        """stack(3,
           'o_custkey',     nn_cust,   nd_cust,   min_cust,   max_cust,
           'o_orderstatus', nn_status, nd_status, min_status, max_status,
           'o_totalprice',  nn_price,  nd_price,  min_price,  max_price
        ) AS (col_name, n_nonnull, n_distinct, min_value, max_value)"""
    ).select(
        "col_name", "n_rows", "n_nonnull", "n_distinct", "min_value", "max_value"
    )


# --------------------------------------------------------------------------
# k-anonymity audit over the pseudonymized quasi-identifiers
# --------------------------------------------------------------------------
KANON_K = 5


@register(
    "q_kanon_audit",
    oracle=f"""WITH qi AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_bucket
    FROM customer
),
classes AS (
  SELECT nationkey, mktsegment, acctbal_bucket, count(*) AS class_size
    FROM qi GROUP BY 1, 2, 3
)
SELECT CAST(sum(CASE WHEN class_size < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_risky_classes,
       CAST(sum(CASE WHEN class_size < {KANON_K} THEN class_size ELSE 0 END) AS BIGINT)
         AS n_risky_rows,
       count(*) AS n_classes,
       min(class_size) AS min_class_size,
       round(CAST(sum(CASE WHEN class_size < {KANON_K} THEN class_size ELSE 0 END) AS DOUBLE)
             / sum(class_size), 6) AS risky_row_frac
  FROM classes
""",
    doc="k-anonymity audit: equivalence classes over the quasi-identifier "
    "tuple q_pii_pseudonymize retains (nation, segment, balance bucket); "
    f"classes smaller than k={KANON_K} are re-identification risks the "
    "release gate must suppress or generalize. One hash aggregation on "
    "the QI key (map-side combined) plus a scalar census — the audit "
    "costs one shuffle of distinct QI tuples regardless of corpus size.",
)
def q_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    classes = (
        c.select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.floor(F.col("c_acctbal") / 1000)
            .cast("bigint")
            .alias("acctbal_bucket"),
        )
        .groupBy("nationkey", "mktsegment", "acctbal_bucket")
        .agg(F.count("*").alias("class_size"))
    )
    risky = F.when(F.col("class_size") < KANON_K, F.col("class_size")).otherwise(
        F.lit(0)
    )
    return classes.agg(
        F.sum((F.col("class_size") < KANON_K).cast("int"))
        .cast("bigint")
        .alias("n_risky_classes"),
        F.sum(risky).cast("bigint").alias("n_risky_rows"),
        F.count("*").alias("n_classes"),
        F.min("class_size").alias("min_class_size"),
        F.round(
            F.sum(risky).cast("double") / F.sum("class_size"), 6
        ).alias("risky_row_frac"),
    )


# --------------------------------------------------------------------------
# differentially-private release: Laplace-noised group counts
# --------------------------------------------------------------------------
DP_EPSILON = 0.5  # count queries have sensitivity 1 => scale = 1/eps
DP_SCALE = 1.0 / DP_EPSILON
DP_RELEASE_MIN = 10.0  # noisy-count floor below which the cell is suppressed


@register(
    "q_dp_counts",
    oracle=f"""WITH counts AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_true
    FROM customer GROUP BY 1
),
noised AS (
  SELECT nationkey, n_true,
         (CAST('0x' || substr(md5('dp:' || CAST(nationkey AS VARCHAR)), 1, 7)
               AS BIGINT) % 1000000 + 1) / 1000002.0 AS r
    FROM counts
)
SELECT nationkey, n_true,
       round(-{DP_SCALE} * sign(r - 0.5) * ln(1 - 2 * abs(r - 0.5)), 6)
           AS noise,
       round(n_true - {DP_SCALE} * sign(r - 0.5) * ln(1 - 2 * abs(r - 0.5)), 6)
           AS n_noisy,
       (n_true - {DP_SCALE} * sign(r - 0.5) * ln(1 - 2 * abs(r - 0.5)))
           >= {DP_RELEASE_MIN} AS released
  FROM noised
""",
    doc="differentially-private count release: per-nation customer counts "
    f"with Laplace(1/eps={DP_SCALE}) noise from a salted-hash inverse CDF "
    "(u = md5-derived uniform in (0,1), noise = -scale*sign(u-.5)*"
    "ln(1-2|u-.5|)) and a noisy-threshold suppression flag — the privacy "
    "release stage after q_pii_pseudonymize and the q_kanon_audit gate. "
    "Deterministic by construction (the salt plays the per-release RNG "
    "seed), so both engines draw the identical noise; one map-side-"
    "combined aggregation, noise is a row-local projection on the "
    "group-cardinality-bounded result.",
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prefect_flow_arc_indexer_spark.functions.hashing import stable_hash

    counts = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_true"))
    )
    r = (
        stable_hash(
            F.concat(F.lit("dp:"), F.col("nationkey").cast("string"))
        )
        % 1000000
        + 1
    ) / F.lit(1000002.0)
    noise = (
        -F.lit(DP_SCALE)
        * F.signum(r - 0.5)
        * F.log(1 - 2 * F.abs(r - 0.5))
    )
    return counts.select(
        "nationkey",
        "n_true",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("n_true") + noise, 6).alias("n_noisy"),
        ((F.col("n_true") + noise) >= DP_RELEASE_MIN).alias("released"),
    )


# --------------------------------------------------------------------------
# entity resolution completed: golden records from fuzzy-match clusters
# --------------------------------------------------------------------------
def _register_golden_record():
    """Closure-registered so the oracle embeds the registered fuzzy-match
    oracle as its edge list — the canonicalization stays in lockstep with
    the matcher that feeds it."""
    from prefect_flow_arc_indexer_spark.plans.registry import _REGISTRY

    fuzzy_sql = _REGISTRY["q_fuzzy_match"].oracle
    oracle = f"""WITH RECURSIVE pairs AS ({fuzzy_sql}),
edges AS (
  SELECT key_a AS src, key_b AS dst FROM pairs
  UNION ALL
  SELECT key_b, key_a FROM pairs
),
reach(id, comp) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
labels AS (
  SELECT id AS c_custkey, min(comp) AS entity_id FROM reach GROUP BY id
),
members AS (
  SELECT l.entity_id, c.c_custkey, c.c_name, c.c_nationkey, c.c_mktsegment,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM labels l JOIN customer c ON c.c_custkey = l.c_custkey
)
SELECT entity_id,
       count(*) AS n_members,
       min(CASE WHEN c_custkey = entity_id THEN c_name END) AS canonical_name,
       min(c_nationkey) AS nationkey,
       min(c_mktsegment) AS mktsegment,
       CAST(sum(bal_cents) AS BIGINT) AS bal_cents_total,
       round(CAST(sum(bal_cents) AS DOUBLE) / count(*) / 100.0, 6)
           AS avg_acctbal
  FROM members
 GROUP BY entity_id
HAVING count(*) > 1
"""

    @register(
        "q_golden_record",
        oracle=oracle,
        doc="entity resolution completed: fuzzy-match pairs (blocked "
        "levenshtein) -> connected components (min-label propagation + "
        "pointer jumping, the same O(log diameter) CC kernel as "
        "q_dedup_components) -> one GOLDEN RECORD per multi-member "
        "entity: canonical name from the min-key member, merged balance "
        "in exact integer cents — the master-data-management "
        "canonicalization step downstream systems consume instead of raw "
        "duplicated rows. Corpus cost: the blocked pair join + "
        "O(log diameter) label rounds over edge-incident nodes only; "
        "the golden-record aggregation is one hash agg on entity_id.",
    )
    def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
        from prefect_flow_arc_indexer_spark.functions.caching import (
            CheckpointRelease,
            release_local_checkpoint,
        )
        from prefect_flow_arc_indexer_spark.operators.dedup import (
            connected_components,
        )

        fuzzy = _REGISTRY["q_fuzzy_match"].builder(spark, sf_dir)
        pairs = fuzzy.select(
            F.col("key_a").alias("src"), F.col("key_b").alias("dst")
        )
        # snapshot the (tiny: one row per matched pair) edge list before
        # the CC loop: CC's union references its input TWICE per
        # materialization, and re-planning the deep fuzzy lineage
        # (persisted variant relations + three joins + a union) per round
        # measured 18 s vs 6 s on the flat snapshot at sf0.1
        pairs = pairs.localCheckpoint(eager=True)
        try:
            # cc_labels is CC's returned eager checkpoint — kept raw (no
            # select on top) so the release handle attached to the result
            # below sees the LogicalRDD plan it must unpersist
            cc_labels = connected_components(pairs)
        finally:
            # CC either returned its own checkpoint or raised — either
            # way the edge snapshot and the fuzzy stage's internal caches
            # are fully consumed; free them on BOTH exits so a
            # non-convergence raise can't strand them (ADVICE r8)
            release_local_checkpoint(pairs)
            fuzzy.sig_release.release()
            fuzzy.dn_release.release()
        labels = cc_labels.select(
            F.col("id").alias("c_custkey"), F.col("comp").alias("entity_id")
        )
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias(
                "bal_cents"
            ),
        )
        members = labels.join(cust, "c_custkey")
        out = (
            members.groupBy("entity_id")
            .agg(
                F.count("*").alias("n_members"),
                F.min(
                    F.when(
                        F.col("c_custkey") == F.col("entity_id"),
                        F.col("c_name"),
                    )
                ).alias("canonical_name"),
                F.min("c_nationkey").alias("nationkey"),
                F.min("c_mktsegment").alias("mktsegment"),
                F.sum("bal_cents").cast("bigint").alias("bal_cents_total"),
                F.round(
                    F.sum("bal_cents").cast("double") / F.count("*") / 100.0,
                    6,
                ).alias("avg_acctbal"),
            )
            .where(F.col("n_members") > 1)
        )
        # hand the caller the label-checkpoint release, like
        # near_dedup_keepers does — without it every call strands one
        # label-set checkpoint in a long-lived session (ADVICE r8)
        out.ckpt_release = CheckpointRelease(cc_labels)
        return out


_register_golden_record()

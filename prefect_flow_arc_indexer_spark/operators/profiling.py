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
    doc="entity-resolution fuzzy match: candidate pairs BLOCKED on a "
    "compound equi-key (nation, segment) so the edit-distance predicate "
    "only runs within blocks — the join is a plain hash join on the "
    "blocking key and the quadratic Levenshtein work is |block|^2, never "
    "|table|^2; every extra independent blocking attribute divides the "
    "pair count by its cardinality (the knob that keeps this tractable "
    "at 100 TB). Sorted-neighborhood / phonetic / LSH keys all slot into "
    "the same shape; scoring is JVM banded levenshtein, no UDF",
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    a = cust.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
    )
    b = cust.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
    )
    # threshold form: banded O(threshold * len) per pair with early exit
    # (returns -1 past the bound) instead of the full O(len^2) DP — the
    # unbounded form measured 13.3s at sf0.1 on ~9M in-block pairs; most
    # pairs blow the bound in the first rows of the band
    dist = F.levenshtein("name_a", "name_b", FUZZY_MAX_DIST)
    return (
        a.join(b, ["nk", "seg"])
        .where(F.col("key_a") < F.col("key_b"))
        .where(dist >= 0)
        .select("key_a", "key_b", dist.alias("edit_dist"))
    )


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

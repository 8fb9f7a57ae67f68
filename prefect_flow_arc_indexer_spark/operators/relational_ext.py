"""The remaining classic warehouse join shapes (TPC-H Q2/Q7/Q8/Q9/Q11/Q13/
Q14/Q15/Q16/Q18/Q21/Q22 analogs), adapted to the testdata star schema — the
reference itself never joins two tables (SURVEY §2.4: ABSENT), so this module
completes the join-planning surface a warehouse user of the engine needs.

The testdata has no ``partsupp`` and no ``l_commitdate/l_receiptdate``; the
shapes that need them (Q2/Q9/Q11/Q21) are re-keyed onto the columns that
exist, keeping the PLAN shape (the thing that matters at 100 TB) intact:
min-over-group + join-back, multi-nation join chains, global-threshold scalar
subqueries, exists/not-exists per-group predicates.

Scale posture shared by all twelve:
- dimension tables (region/nation/supplier/part) are broadcast, with their
  filters applied BEFORE the broadcast so the build side is pre-shrunk;
- fact-side aggregations are partial-then-final hash aggs keyed on the join
  key they already shuffled on, so AQE reuses the exchange;
- money math is DECIMAL(18,2) end-to-end (sums are associative-exact, so
  partial-agg order can't drift vs the oracle) and cast to DOUBLE only at
  the output boundary;
- global thresholds (Q11/Q15/Q22) are 1-row aggregates broadcast back over
  the detail — never a driver collect — and every threshold comparison is
  cross-multiplied into exact decimal arithmetic instead of dividing into
  drift-prone doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from prefect_flow_arc_indexer_spark.plans.registry import register
from prefect_flow_arc_indexer_spark.sources.parquet import load_table


def _dec(col):
    return (F.col(col) if isinstance(col, str) else col).cast("decimal(18,2)")


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


@register(
    "q_volume_shipping",
    oracle=f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum({_REV}) AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
 WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
   AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
   AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
 GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
    doc="TPC-H Q7 shape (volume shipping): 5-way join across two nation "
    "roles; nation pair filter applied inside the broadcast dims so the "
    "fact scan is the only large input",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    # pre-shrink both entity sides to the two nations before touching the fact
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "q_market_share",
    oracle=f"""WITH sales AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         sum({_REV}) AS total,
         sum(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV}
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_rev
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    JOIN region r   ON n2.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
   WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
   GROUP BY year(o.o_orderdate)
)
SELECT o_year,
       round(CAST(nation_rev AS DOUBLE) / CAST(total AS DOUBLE), 6) AS mkt_share
  FROM sales
""",
    doc="TPC-H Q8 shape (market share): one nation's revenue share within a "
    "region/part-type slice per year; conditional decimal sums, the ratio "
    "taken once per year row (exact numerator/denominator, 6dp)",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nat = load_table(spark, sf_dir, "nation")
    c = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = _rev()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(rev).alias("total"),
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero)
            ).alias("nation_rev"),
        )
        .select(
            "o_year",
            F.round(
                F.col("nation_rev").cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("mkt_share"),
        )
    )


@register(
    "q_product_profit",
    oracle=f"""SELECT n.n_name AS nation,
       CAST(year(l.l_shipdate) AS INT) AS o_year,
       CAST(sum({_REV}) - sum(CAST(p.p_retailprice AS DECIMAL(18,2))
                              * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS profit
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
 WHERE p.p_name LIKE '%widget%'
 GROUP BY n.n_name, year(l.l_shipdate)
""",
    doc="TPC-H Q9 shape (product profit): revenue minus retail-cost proxy "
    "(no partsupp in the testdata) per supplier nation and year; both "
    "terms summed as exact decimals, subtracted once per group",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    nat = load_table(spark, sf_dir, "nation")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("l_shipdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(_rev())
                - F.sum(_dec("p_retailprice") * _dec("l_quantity"))
            )
            .cast("double")
            .alias("profit")
        )
    )


@register(
    "q_important_stock",
    oracle="""WITH v AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2))) AS val
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
   WHERE s_nationkey = 5
   GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
  FROM v
 WHERE val * 1000 > (SELECT sum(val) FROM v)
""",
    doc="TPC-H Q11 shape (important stock): per-part value for one nation's "
    "suppliers, kept when above 0.1% of the global total — the global "
    "threshold is a 1-row aggregate broadcast back over the detail, and "
    "the comparison is cross-multiplied decimal (no double division)",
)
def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").where(
        F.col("s_nationkey") == 5
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    v = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("val"))
    )
    total = v.agg(F.sum("val").alias("total"))
    return (
        v.join(F.broadcast(total))
        .where(F.col("val") * 1000 > F.col("total"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


@register(
    "q_customer_distribution",
    oracle="""WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
   GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
  FROM per_cust
 GROUP BY c_count
""",
    doc="TPC-H Q13 shape (customer distribution): left outer join so "
    "order-less customers keep c_count=0, then the distribution of "
    "customers per order count; both aggs key on already-shuffled keys",
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q_promo_revenue",
    oracle=f"""SELECT round(
         100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(sum({_REV}) AS DOUBLE), 6) AS promo_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
 WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
   AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""",
    doc="TPC-H Q14 shape (promo revenue): one-month fact slice x broadcast "
    "part, conditional-sum ratio — exact decimal sums, single 6dp-rounded "
    "double division at the output",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).alias("pr"),
            F.sum(rev).alias("total"),
        )
        .select(
            F.round(
                F.lit(100.0) * F.col("pr").cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q_top_supplier",
    oracle=f"""WITH r AS (
  SELECT l_suppkey, sum({_REV}) AS rev
    FROM lineitem
   WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
     AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
   GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev AS DOUBLE) AS total_revenue
  FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
 WHERE r.rev = (SELECT max(rev) FROM r)
""",
    doc="TPC-H Q15 shape (top supplier): quarterly revenue per supplier, "
    "keep the max — the max is a 1-row broadcast and the tie-capable "
    "equality runs on exact decimals (double max would be order-unstable)",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    r = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("rev"))
    mx = r.agg(F.max("rev").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        r.join(F.broadcast(mx))
        .where(F.col("rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("rev").cast("double").alias("total_revenue"))
    )


@register(
    "q_parts_supplier_counts",
    oracle="""SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
 WHERE p.p_brand <> 'Brand#1'
   AND p.p_size IN (1, 5, 10, 15, 20, 25)
   AND l.l_suppkey NOT IN
       (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
 GROUP BY p.p_brand, p.p_type, p.p_size
""",
    doc="TPC-H Q16 shape (parts/supplier relationship): distinct-supplier "
    "counts per (brand, type, size) with a NOT-IN supplier exclusion — "
    "the exclusion list is a broadcast anti join, the distinct agg "
    "pre-dedups map-side on (group, suppkey)",
)
def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_large_orders",
    oracle="""WITH big AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice, b.sum_qty
  FROM big b
  JOIN orders o   ON b.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
""",
    doc="TPC-H Q18 shape (large-volume customers): HAVING on the per-order "
    "quantity sum (integral doubles — exact), then joins back to orders/"
    "customer; the HAVING output is tiny, so both joins broadcast it",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


@register(
    "q_sales_opportunity",
    oracle="""WITH thr AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s,
         count(*) AS c
    FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey,
       count(*) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
  FROM customer c, thr
 WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * thr.c > thr.s
   AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
 GROUP BY c.c_nationkey
""",
    doc="TPC-H Q22 shape (sales opportunity): lapsed high-balance customers "
    "— balance above the positive-balance mean (cross-multiplied decimal, "
    "no double division) with no recent orders (anti join on the "
    "date-filtered fact); grouped by nation",
)
def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    thr = c.where(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).cast("decimal(38,2)").alias("s"),
        F.count("*").alias("c"),
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-07-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(thr))
        .where(_dec("c_acctbal") * F.col("c") > F.col("s"))
        .join(
            recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q_min_price_supplier",
    oracle="""WITH offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS offer_price
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, min(offer_price) AS best_price FROM offers
   GROUP BY l_partkey
)
SELECT o.l_partkey, p.p_name,
       min(o.l_suppkey) AS supplier,
       CAST(b.best_price AS DOUBLE) AS best_price
  FROM offers o
  JOIN best b ON o.l_partkey = b.l_partkey AND o.offer_price = b.best_price
  JOIN part p ON o.l_partkey = p.p_partkey
 GROUP BY o.l_partkey, p.p_name, b.best_price
""",
    doc="TPC-H Q2 shape (min-cost supplier, no partsupp): cheapest observed "
    "supplier per part (doubles under MIN are order-stable, unlike SUM), "
    "deterministic min-suppkey tie-break. r12 (guide §2.4): the min-over-"
    "group + join-back-on-the-exact-min pair is a min-over-WINDOW + "
    "filter — the per-(part,supplier) offers aggregation was evaluated "
    "once per join side (a separately-planned subtree on each, no "
    "exchange reuse), and the window keyed on the partkey the offers "
    "exchange already established replaces the second aggregation AND "
    "the join outright; filter-on-equality keeps exactly the join's rows",
)
def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("offer_price")
    )
    kept = offers.withColumn(
        "best_price",
        F.min("offer_price").over(Window.partitionBy("l_partkey")),
    ).where(F.col("offer_price") == F.col("best_price"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        kept.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "p_name", "best_price")
        .agg(F.min("l_suppkey").alias("supplier"))
        .select(
            "l_partkey",
            "p_name",
            "supplier",
            F.col("best_price").cast("double").alias("best_price"),
        )
    )


@register(
    "q_waiting_suppliers",
    oracle="""WITH per AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret
    FROM lineitem GROUP BY l_orderkey, l_suppkey
),
ord AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(has_ret) AS n_ret
    FROM per GROUP BY l_orderkey
)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
  FROM per
  JOIN ord ON per.l_orderkey = ord.l_orderkey
  JOIN supplier s ON per.l_suppkey = s.s_suppkey
 WHERE per.has_ret = 1 AND ord.n_supp > 1 AND ord.n_ret = 1
 GROUP BY s.s_suppkey, s.s_name
""",
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the sole "
    "returning supplier on multi-supplier orders — the exists/not-exists "
    "pair decorrelated into one per-(order,supplier) agg plus a per-order "
    "WINDOW over that agg — one scan of the fact, never a self-join of it",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("has_ret")
    )
    # per-order rollup as a WINDOW over the same aggregate: one fact scan
    # (a groupBy+join-back formulation evaluates the agg subtree twice)
    w = Window.partitionBy("l_orderkey")
    per = per.select(
        "*",
        F.count("*").over(w).alias("n_supp"),
        F.sum("has_ret").over(w).alias("n_ret"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.where(
            (F.col("has_ret") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_ret") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q_forecast_revenue",
    oracle="""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS potential_revenue
  FROM lineitem
 WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
   AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
   AND l_discount BETWEEN 0.05 AND 0.07
   AND l_quantity < 24
""",
    doc="TPC-H Q6 shape (forecast revenue change): single-table "
    "filter-and-sum — every predicate (shipdate range, discount band, "
    "quantity cap) reaches the parquet scan as a pushed filter, the "
    "aggregation is a map-side partial sum over exact decimals, and the "
    "shuffle moves exactly one partial row per partition. The canonical "
    "'is pushdown actually working' probe: at 100 TB this query's cost "
    "is the scan, nothing else.",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("potential_revenue")
        )
    )


@register(
    "q_shipmode_priority",
    oracle="""SELECT l.l_returnflag AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
 WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
   AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
 GROUP BY l.l_returnflag
""",
    doc="TPC-H Q12 shape (shipping modes / order priority): fact-to-fact "
    "equi-join with conditional counts split by the joined side's "
    "priority attribute (re-keyed onto l_returnflag — the testdata has no "
    "l_shipmode/commitdate/receiptdate; SURVEY §7 re-keying rule). The "
    "CASE sums fold into ONE aggregate pass after the join; the shipdate "
    "window prunes the fact scan before the shuffle, and both sides "
    "shuffle on the orderkey they join on — no second exchange for the "
    "tiny group-by key (AQE reuses the join output partitioning only for "
    "same-key aggs, so the 3-group rollup is a cheap extra exchange of "
    "partial rows, not of the joined detail).",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q_promo_part_suppliers",
    oracle="""WITH sp AS (
  SELECT l.l_suppkey, l.l_partkey,
         sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS supp_qty
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
   WHERE p.p_type = 'PROMO'
     AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
     AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
   GROUP BY l.l_suppkey, l.l_partkey
),
pt AS (
  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS part_qty
    FROM lineitem
   WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
     AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
   GROUP BY l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
  FROM supplier s
  JOIN sp ON sp.l_suppkey = s.s_suppkey
  JOIN pt ON pt.l_partkey = sp.l_partkey
 WHERE sp.supp_qty * 10 > pt.part_qty
""",
    doc="TPC-H Q20 shape (potential part promotion): nested semi-join "
    "chain — suppliers who moved more than 10% of a promo-type part's "
    "total shipped quantity in the window (re-keyed from the partsupp "
    "availqty > 0.5*sum(qty) original: no partsupp in testdata; the "
    "threshold stays a per-part global aggregate joined back onto the "
    "per-(supplier, part) aggregate). Plan shape: the window-filtered "
    "fact is aggregated TWICE at different granularities of the same "
    "scan — (suppkey, partkey) and (partkey) — both partial-map-side; "
    "the part filter broadcasts into the fine-grained branch, the "
    "threshold comparison is integer-exact decimal cross-multiplication, "
    "and the supplier dim joins last against the already-tiny verdict "
    "set.",
)
def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_partkey", "l_quantity")
    )
    promo = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    sp = (
        li.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("supp_qty"))
    )
    pt = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("part_qty")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    verdict = (
        sp.join(pt.withColumnRenamed("l_partkey", "pt_partkey"),
                F.col("l_partkey") == F.col("pt_partkey"))
        .where(F.col("supp_qty") * 10 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    # the verdict set is a filtered aggregate (tiny by construction):
    # broadcast it into the semi join so the supplier dim never shuffles
    return s.join(
        F.broadcast(verdict),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")

"""Classic TPC-H query shapes for join/agg plan diversity (Q3, Q14,
Q18 analogs on the driver's star schema). These add plan shapes the
flagship doesn't cover: mixed-key group-by after a 3-way join, a
conditional-aggregation ratio, and a HAVING-filtered subquery join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

# Q3-style: shipping-priority top-k for one segment.
Q3_ORACLE = """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


# Q14-style: conditional-aggregation revenue share (PROMO parts).
Q14_ORACLE = """
SELECT ROUND(
         100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
         / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-07-01'
"""


@register("q14_promo_revenue_share", Q14_ORACLE)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # part is SF-linear — no broadcast hint, AQE decides.
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# Q18-style: large-volume orders (HAVING subquery joined back).
Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150
)
SELECT c.c_name, o.o_orderkey,
       ROUND(o.o_totalprice, 2) AS o_totalprice,
       ROUND(b.sum_qty, 2) AS sum_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


@register("q18_large_volume_orders", Q18_ORACLE)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_raw"))
        .where(F.col("sum_qty_raw") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty_raw", 2).alias("sum_qty"),
        )
    )


# Q17-style: correlated scalar subquery — revenue from small-quantity
# line items, "small" defined PER PART as 20% of that part's average
# quantity. Exercises Catalyst's subquery decorrelation: the optimizer
# rewrites the per-row subquery into a partkey-grouped aggregate joined
# back (exactly the plan you would hand-write), so the SQL stays
# declarative and the physical plan is one extra shuffle on l_partkey
# plus a broadcast of the filtered part dim — 100x-safe.
Q17_SQL = """
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
"""

Q17_ORACLE = Q17_SQL


@register("q17_small_quantity_revenue", Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical correlated-subquery text on both engines: Spark's
    Catalyst decorrelates it (RewriteCorrelatedScalarSubquery -> agg +
    join); DuckDB runs its own unnesting. Plan checked in PLANS.md."""
    from tfm_semisup_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(Q17_SQL)


# Q4-style: EXISTS-driven priority count. Plan shape: left-semi join
# (EXISTS decorrelates to LeftSemi) into a low-cardinality groupBy —
# at 100 TB the semi join shuffles only (orderkey) pairs and the agg
# is 5 groups with map-side partials.
Q4_ORACLE = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
  AND o.o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("q4_priority_with_returns", Q4_ORACLE)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (EXISTS -> left-semi; l_returnflag='R' stands in
    for the reference schema's commit/receipt-date predicate, which the
    synthetic lineitem doesn't carry)."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    returned = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# Q13-style: customer order-count distribution. Plan shape: LEFT OUTER
# join (customers with zero orders must survive) -> per-customer count
# -> count-of-counts histogram. Two shuffles; the second input is one
# row per customer, so the histogram agg is cheap at any scale.
Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_customer_distribution", Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog (o_orderstatus <> 'F' stands in for the comment
    anti-pattern filter; COUNT(col) counts non-null join matches only,
    preserving the zero-order customers as c_count=0)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "F")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# Q16-style: supplier diversity per part attribute, excluding a
# NOT-IN supplier set. Plan shape: broadcast anti join (the excluded
# set is tiny) -> join to part -> COUNT(DISTINCT) per attribute
# triple (two-phase distinct agg; partials before the shuffle).
Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (5, 10, 15, 20)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
LIMIT 20
"""


@register("q16_supplier_diversity", Q16_ORACLE)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog (s_acctbal < 0 stands in for the complaints
    comment filter). NOT IN is safe as left_anti here because
    s_suppkey is non-null by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    excluded = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


# Q22-style: well-funded customers with no URGENT orders, by nation.
# Plan shape: uncorrelated scalar subquery (one broadcast double) +
# NOT EXISTS anti join + per-nation agg — three distinct Catalyst
# rewrites in one query. The anti-join side is restricted to urgent
# orders because EVERY synthetic customer has some order — the
# original no-orders form returned 0 rows at every SF, a vacuous
# driver pass (r13 vacuity audit; same fix as
# anti_join_no_urgent_customers, VERDICT r11 #5).
Q22_ORACLE = """
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@register("q22_global_sales_opportunity", Q22_ORACLE)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog (nationkey stands in for the phone country
    code the synthetic customer table doesn't carry; 'never placed an
    urgent order' stands in for 'no orders' — see Q22_ORACLE note)."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal"))
        .head()[0]
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.where(F.col("c_acctbal") > avg_bal)
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )

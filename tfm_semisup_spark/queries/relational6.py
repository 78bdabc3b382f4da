"""Sixth relational coverage block: scalar subqueries, IN-subqueries,
distinct set ops, offset pagination."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

# Scalar subquery: orders above the global average price. DataFrame
# form: broadcast the 1-row aggregate (what Catalyst rewrites scalar
# subqueries into anyway).
SCALAR_SUBQ_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
GROUP BY o_orderpriority
"""


@register("scalar_subquery_above_avg", SCALAR_SUBQ_ORACLE)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    avg_price = orders.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        orders.crossJoin(F.broadcast(avg_price))
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# IN-subquery: lineitems of urgent orders (semi-join rewrite).
IN_SUBQ_ORACLE = """
SELECT l_returnflag, COUNT(*) AS n
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


@register("in_subquery_urgent_lineitems", IN_SUBQ_ORACLE)
def in_subquery_urgent_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# UNION (distinct) + EXCEPT (distinct) — the set-op variants the
# reference never used (it used unionAll/exceptAll). The EXCEPT side
# is the BOTTOM-10 customers by (acctbal, custkey) — a bounded,
# deterministic top-k, so it can remove at most 10 of the ~25 nations
# at ANY corpus size. The previous predicate form (acctbal < -900)
# emptied the whole result at sf0.1: with 15k customers every nation
# has at least one sub--900 balance, so the EXCEPT removed all 25
# nations — an SF-driven vacuity found by the r14 full sf0.1 sweep
# (non-vacuous re-measured: 16/16/17 rows at sf0.001/0.01/0.1).
DISTINCT_SETOPS_ORACLE = """
SELECT nk, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
  UNION
  SELECT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT c_nationkey AS nk FROM (
    SELECT c_nationkey FROM customer ORDER BY c_acctbal, c_custkey LIMIT 10
  )
)
GROUP BY nk
"""


@register("distinct_set_ops", DISTINCT_SETOPS_ORACLE)
def distinct_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.where(F.col("c_acctbal") > 5000).select(F.col("c_nationkey").alias("nk"))
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nk")
    )
    broke = (
        cust.orderBy("c_acctbal", "c_custkey")
        .limit(10)
        .select(F.col("c_nationkey").alias("nk"))
    )
    combined = rich.union(building).distinct().exceptAll(broke.distinct())
    # NB: SQL UNION/EXCEPT bind left-assoc with equal precedence in both
    # engines: ((rich UNION building) EXCEPT broke), all distinct.
    return combined.groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


# LIMIT/OFFSET pagination with a total ordering.
OFFSET_ORACLE = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 20
"""


@register("limit_offset_page", OFFSET_ORACLE)
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(20)
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


# FULL OUTER join — the one join type the battery didn't yet pin.
# Per-nation customer vs supplier presence: the synthetic schema has
# ~25 nations but far fewer suppliers, so one side of the join is
# genuinely NULL for most rows (the shape's whole point). COALESCE on
# the join key recovers the nation for name lookup; missing sides
# surface as 0 counts.
FULL_OUTER_ORACLE = """
WITH c AS (
  SELECT c_nationkey AS nk, COUNT(*)::BIGINT AS n_customers
  FROM customer GROUP BY c_nationkey
),
s AS (
  SELECT s_nationkey AS nk, COUNT(*)::BIGINT AS n_suppliers
  FROM supplier GROUP BY s_nationkey
)
SELECT n.n_name,
       COALESCE(c.n_customers, 0)::BIGINT AS n_customers,
       COALESCE(s.n_suppliers, 0)::BIGINT AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nk = s.nk
JOIN nation n ON n.n_nationkey = COALESCE(c.nk, s.nk)
ORDER BY n.n_name
"""


@register("nation_presence_full_outer", FULL_OUTER_ORACLE)
def nation_presence_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation (n_customers, n_suppliers) via FULL OUTER join of the
    two per-nation aggregates."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    both = cust.join(sup, cust["nk_c"] == sup["nk_s"], "full_outer")
    return (
        both.join(
            nat,
            nat["n_nationkey"] == F.coalesce(F.col("nk_c"), F.col("nk_s")),
        )
        .select(
            "n_name",
            F.coalesce("n_customers", F.lit(0)).cast("long").alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).cast("long").alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


# RANGE window frame — value-based (not row-count) framing, the shape
# behind "rolling 30-day revenue". Portable ordering key: days since
# epoch date, so Spark's long-typed rangeBetween and DuckDB's RANGE
# BETWEEN use the identical integer axis.
RANGE_FRAME_ORACLE = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY datediff('day', DATE '1990-01-01', o_orderdate)
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       ), 2) AS revenue_30d
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@register("running_revenue_30d_range", RANGE_FRAME_ORACLE)
def running_revenue_30d_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rolling 30-day revenue via a RANGE frame over a
    day-number ordering key: (o_custkey, o_orderkey, order_date,
    revenue_30d)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    day_key = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_key)
        .rangeBetween(-30, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# Correlated LATERAL join — per-driving-row subquery with its own
# ORDER BY + LIMIT ("top-2 orders per customer"). Spark decorrelates
# the lateral into a ranked join under the hood; the textual shape is
# the SQL-standard one and runs IDENTICALLY on DuckDB, so the oracle
# is the same string.
LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) o
ORDER BY c.c_custkey, o_totalprice DESC, o.o_orderkey
"""


@register("lateral_top2_orders", LATERAL_SQL)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via a correlated LATERAL subquery —
    same SQL text on both engines."""
    from tfm_semisup_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(LATERAL_SQL)


# NTILE / PERCENT_RANK / CUME_DIST — the rank-statistics window family
# the battery didn't yet pin. Partitioned by order status (never a
# single global window), aggregated to a bounded quartile summary.
NTILE_ORACLE = """
WITH ranked AS (
  SELECT o_orderstatus,
         o_totalprice,
         NTILE(4) OVER w AS quartile,
         PERCENT_RANK() OVER w AS pr,
         CUME_DIST() OVER w AS cd
  FROM orders
  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT o_orderstatus, quartile,
       COUNT(*)::BIGINT AS n_orders,
       round(MIN(o_totalprice), 2) AS min_price,
       round(MAX(o_totalprice), 2) AS max_price,
       round(MAX(pr), 6) AS max_percent_rank,
       round(MAX(cd), 6) AS max_cume_dist
FROM ranked
GROUP BY o_orderstatus, quartile
ORDER BY o_orderstatus, quartile
"""


@register("ntile_price_quartiles", NTILE_ORACLE)
def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status price quartiles with rank statistics:
    (o_orderstatus, quartile, n_orders, min_price, max_price,
    max_percent_rank, max_cume_dist)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    ranked = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return (
        ranked.groupBy("o_orderstatus", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.max("pr"), 6).alias("max_percent_rank"),
            F.round(F.max("cd"), 6).alias("max_cume_dist"),
        )
        .orderBy("o_orderstatus", "quartile")
    )

"""Second relational coverage block: null handling, set ops, grouping
sets, analytic windows, frequency indexing, range + as-of joins.

Extends SURVEY.md §2.2 coverage (na.drop, intersect) and §2.3 event-time
ops; the as-of join checks our composed operator against DuckDB's
NATIVE ``ASOF JOIN`` — two independent implementations of the
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

# na.drop (reference: `SemiSupervisedAndBaseClassifiers.scala:58`,
# null-count `BaseClassifiers.scala:271`). The synthetic tables are
# null-free, so nulls are manufactured with NULLIF on both sides.
NA_DROP_ORACLE = """
WITH withnulls AS (
  SELECT c_custkey, NULLIF(c_mktsegment, 'MACHINERY') AS segment, c_acctbal
  FROM customer
)
SELECT segment, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS total_bal
FROM withnulls
WHERE segment IS NOT NULL
GROUP BY segment
"""


@register("na_drop_clean", NA_DROP_ORACLE)
def na_drop_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    withnulls = cust.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("segment"),
        "c_acctbal",
    )
    return (
        withnulls.na.drop(subset=["segment"])
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# intersectAll (SURVEY §2.2 set ops: "available if needed")
INTERSECT_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n
FROM (
  SELECT * FROM orders WHERE o_totalprice > 150000
  INTERSECT ALL
  SELECT * FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY o_orderpriority
"""


@register("intersect_all_common", INTERSECT_ORACLE)
def intersect_all_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    high = orders.where(F.col("o_totalprice") > 150000)
    finished = orders.where(F.col("o_orderstatus") == "F")
    return (
        high.intersectAll(finished)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ROLLUP grouping sets (extension beyond the reference's flat groupBy)
ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("rollup_status_priority", ROLLUP_ORACLE)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# lag + bounded-frame moving average (analytic windows)
MOVING_AVG_ORACLE = """
SELECT o_custkey, o_orderkey,
       COALESCE(ROUND(lag(o_totalprice) OVER w, 2), -1.0) AS prev_price,
       ROUND(avg(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("moving_avg_lag", MOVING_AVG_ORACLE)
def moving_avg_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        # NULL floats are avoided in outputs: pandas NULL->NaN conversion
        # differs between collect() and toPandas()/fetchdf paths
        F.coalesce(F.round(F.lag("o_totalprice").over(w), 2), F.lit(-1.0)).alias(
            "prev_price"
        ),
        F.round(
            F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4
        ).alias("moving_avg"),
    )


# StringIndexer frequencyDesc semantics, made deterministic (ties by
# value) and SQL-checkable: the indexing rule behind featurization C6.
FREQ_INDEX_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(row_number() OVER (ORDER BY COUNT(*) DESC, c_mktsegment) - 1 AS BIGINT)
         AS segment_index
FROM customer
GROUP BY c_mktsegment
"""


@register("categorical_index_freq", FREQ_INDEX_ORACLE)
def categorical_index_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), "c_mktsegment")
    return counts.select(
        "c_mktsegment",
        "n",
        (F.row_number().over(w) - 1).cast("long").alias("segment_index"),
    )


# Non-equi range join: event pairs within a 5-minute window per user.
RANGE_JOIN_ORACLE = """
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL '5 minutes'
GROUP BY a.user_id
"""


@register("range_join_event_pairs", RANGE_JOIN_ORACLE)
def range_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.select(F.col("user_id"), F.col("ts").alias("ts_a"))
    b = events.select(F.col("user_id").alias("user_b"), F.col("ts").alias("ts_b"))
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_b"))
            & (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# As-of join: our composed union+window operator vs DuckDB's NATIVE
# ASOF JOIN. Right side pre-aggregated per (key, time) so ties are
# deterministic in both engines.
ASOF_ORACLE = """
WITH latest AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS last_orderkey,
         ROUND(MAX(o_totalprice), 2) AS last_totalprice
  FROM orders
  GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       COALESCE(l.last_orderkey, -1) AS last_orderkey,
       COALESCE(l.last_totalprice, -1.0) AS last_totalprice
FROM events e
ASOF LEFT JOIN latest l
  ON e.user_id = l.o_custkey AND e.ts >= l.o_orderdate
"""


@register("asof_join_latest_order", ASOF_ORACLE)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tfm_semisup_spark.operators.asof import asof_join_backward

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    latest = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("last_orderkey"),
            F.round(F.max("o_totalprice"), 2).alias("last_totalprice"),
        )
    )
    joined = asof_join_backward(
        events,
        latest,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["last_orderkey", "last_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.coalesce("last_orderkey", F.lit(-1)).alias("last_orderkey"),
        F.coalesce("last_totalprice", F.lit(-1.0)).alias("last_totalprice"),
    )


# CUBE grouping sets (all 4 combinations of the two keys)
CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS total_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_flag_status", CUBE_ORACLE)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )

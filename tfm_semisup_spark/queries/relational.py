"""Relational primitive coverage (SURVEY.md §2.2).

Every distinct dataframe operation the reference uses — scans,
projection/cast/derive, NaN-sentinel filters, union/exceptAll/distinct,
when/otherwise binarization, haversine math, timestamp part extraction,
seeded-mask label selection, top-k, class-distribution counts, and the
grid-results join that replaces the reference's CASE-WHEN update tower
(``FunctionsSemiSupervised.scala:203-253``) — re-expressed as
Catalyst-friendly DataFrame queries over the driver's star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.functions.geo import haversine_km
from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

# ---------------------------------------------------------------------------
# Flagship: star-schema join + filter + agg + top-k.
# Exercises: parquet scan w/ pushdown, broadcast dim joins, shuffle agg,
# TakeOrderedAndProject. The dims (region/nation/customer) broadcast; the
# only big shuffle is the lineitem->orders join and the final groupBy,
# both on keys that AQE can coalesce/skew-split at 100 TB.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '2000-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
LIMIT 5
"""


@register("flagship_regional_revenue", FLAGSHIP_ORACLE)
def flagship_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    return (
        li.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        # dims is region-filtered CUSTOMER — SF-linear, so no broadcast
        # hint; AQE broadcasts it while it fits and shuffle-joins past
        # that (a hard hint would be a job failure at 100 TB).
        .join(dims, F.col("o_custkey") == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: the canonical partial-agg (map-side
# combine) groupBy. 3 distinct group keys -> trivially small shuffle.
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", Q1_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projection / cast / derive (reference: Adult string->double casts
# `SemiSupervisedAndBaseClassifiers.scala:320-324`, class binarization
# buckets `:571-573`). Pure narrow ops — no shuffle at any scale.
# ---------------------------------------------------------------------------

PROJECT_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_bucket,
       ROUND(o_totalprice / 100.0, 4) AS price_hundreds
FROM orders
"""


@register("project_cast_derive", PROJECT_ORACLE)
def project_cast_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_bucket"),
        # round FINER than the data's decimal precision (totalprice has 2dp,
        # /100 -> 4dp): rounding AT the data precision can land on exact .5
        # ties, where Spark (HALF_UP on shortest-repr) and DuckDB (binary
        # round) disagree.
        F.round(F.col("o_totalprice") / 100.0, 4).alias("price_hundreds"),
    )


# ---------------------------------------------------------------------------
# Range-predicate outlier filters (reference: taxi outlier bounds
# `SemiSupervisedAndBaseClassifiers.scala:931-934`). All predicates push
# to the parquet scan.
# ---------------------------------------------------------------------------

FILTER_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
WHERE l_quantity BETWEEN 5 AND 45
  AND l_discount > 0.01
  AND l_extendedprice < 80000
GROUP BY l_returnflag
"""


@register("filter_range_outliers", FILTER_ORACLE)
def filter_range_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            F.col("l_quantity").between(5, 45)
            & (F.col("l_discount") > 0.01)
            & (F.col("l_extendedprice") < 80000)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# NaN-sentinel label masking + isnan split (reference C1/C4:
# `UnlabeledTransformer.scala:44` mask, `SelfTraining.scala:129` split).
# Deterministic hash-free mask (vec_id % 10) instead of randomSplit so the
# oracle can reproduce membership — the seeded-random variant is the
# UnlabeledTransformer operator itself (rows-only checked).
# At 100 TB this is the recommended masking strategy anyway: a modulus on
# a key column is a narrow map op, vs randomSplit's full-scan sampling.
# ---------------------------------------------------------------------------

NAN_MASK_ORACLE = """
WITH masked AS (
  SELECT label,
         CASE WHEN vec_id % 10 = 0 THEN CAST(label AS DOUBLE)
              ELSE 'NaN'::DOUBLE END AS labelSelection
  FROM embeddings
)
SELECT isnan(labelSelection) AS is_unlabeled,
       COUNT(*) AS n,
       ROUND(AVG(label), 4) AS avg_label
FROM masked
GROUP BY 1
"""


@register("nan_label_mask_stats", NAN_MASK_ORACLE)
def nan_label_mask_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    masked = emb.withColumn(
        "labelSelection",
        F.when(F.col("vec_id") % 10 == 0, F.col("label").cast("double")).otherwise(
            F.lit(float("nan"))
        ),
    )
    return (
        masked.groupBy(F.isnan("labelSelection").alias("is_unlabeled"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("label"), 4).alias("avg_label"),
        )
    )


# ---------------------------------------------------------------------------
# UNION ALL pool append (reference: pseudo-label promotion
# `SelfTraining.scala:154`, pool reassembly `UnlabeledTransformer.scala:45`).
# ---------------------------------------------------------------------------

UNION_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM (
  SELECT * FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT * FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 200000
)
GROUP BY o_orderstatus
"""


@register("union_append_pools", UNION_ORACLE)
def union_append_pools(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pool_a = orders.where(F.col("o_orderstatus") == "F")
    pool_b = orders.where((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000))
    return (
        pool_a.unionAll(pool_b)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# EXCEPT ALL remainder (reference kBest rest-computation:
# `SelfTraining.scala:178` — "unlabeled rest = predictions exceptAll
# top-k"). Multiset semantics preserved. Note SURVEY §4: in the SSC
# operators themselves we replace the labeled/unlabeled exceptAll split
# with complementary filters; exceptAll remains for the top-k rest, which
# is what this query checks.
# ---------------------------------------------------------------------------

EXCEPT_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM (
  SELECT * FROM orders
  EXCEPT ALL
  SELECT * FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000)
)
GROUP BY o_orderpriority
"""


@register("except_all_remainder", EXCEPT_ORACLE)
def except_all_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    top_k = orders.orderBy(F.desc("o_totalprice"), "o_orderkey").limit(1000)
    return (
        orders.exceptAll(top_k)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# DISTINCT (reference: class-cardinality checks
# `SemiSupervisedAndBaseClassifiers.scala:352,556`).
# ---------------------------------------------------------------------------

DISTINCT_ORACLE = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


@register("distinct_flag_status", DISTINCT_ORACLE)
def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Top-k by confidence (reference kBest promotion `SelfTraining.scala:177`
# `sort(desc).limit(k)` -> TakeOrderedAndProject, no full sort at scale).
# ---------------------------------------------------------------------------

TOPK_ORACLE = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("topk_orders", TOPK_ORACLE)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


# ---------------------------------------------------------------------------
# when/otherwise class binarization (reference: poker
# `SemiSupervisedAndBaseClassifiers.scala:571-573`, taxi `:937-938`).
# ---------------------------------------------------------------------------

BINARIZE_ORACLE = """
SELECT event_type,
       CASE WHEN value > 100 THEN 'hi' ELSE 'lo' END AS clase,
       COUNT(*) AS n,
       ROUND(AVG(value), 4) AS avg_value
FROM events
GROUP BY 1, 2
"""


@register("binarize_when_otherwise", BINARIZE_ORACLE)
def binarize_when_otherwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("clase", F.when(F.col("value") > 100, "hi").otherwise("lo"))
        .groupBy("event_type", "clase")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# Class-distribution counts (reference prints
# `SemiSupervisedAndBaseClassifiers.scala:84,343-344`; SURVEY §4 batches
# the reference's 2-4 count() actions into one groupBy pass).
# ---------------------------------------------------------------------------

CLASS_DIST_ORACLE = """
SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n
FROM embeddings
GROUP BY 1
"""


@register("class_distribution", CLASS_DIST_ORACLE)
def class_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Haversine distance (reference: taxi featurization Scala math on RDD rows
# `SemiSupervisedAndBaseClassifiers.scala:899-913` — re-expressed as pure
# column arithmetic; synthetic coords derived from customer columns).
# ---------------------------------------------------------------------------

HAVERSINE_ORACLE = """
SELECT c_custkey,
       ROUND(
         2 * 6371.0 * atan2(
           sqrt(
             pow(sin(radians((c_custkey * 7 % 90) - (abs(c_acctbal) % 90)) / 2), 2)
             + cos(radians(abs(c_acctbal) % 90)) * cos(radians(c_custkey * 7 % 90))
               * pow(sin(radians((c_nationkey * 11 % 180) - (c_custkey % 180)) / 2), 2)
           ),
           sqrt(1 - (
             pow(sin(radians((c_custkey * 7 % 90) - (abs(c_acctbal) % 90)) / 2), 2)
             + cos(radians(abs(c_acctbal) % 90)) * cos(radians(c_custkey * 7 % 90))
               * pow(sin(radians((c_nationkey * 11 % 180) - (c_custkey % 180)) / 2), 2)
           ))
         ), 4) AS dist_km
FROM customer
"""


@register("haversine_distance", HAVERSINE_ORACLE)
def haversine_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    lat1 = F.abs(F.col("c_acctbal")) % 90
    lon1 = F.col("c_custkey") % 180
    lat2 = F.col("c_custkey") * 7 % 90
    lon2 = F.col("c_nationkey") * 11 % 180
    return cust.select(
        "c_custkey",
        F.round(haversine_km(lat1, lon1, lat2, lon2), 4).alias("dist_km"),
    )


# ---------------------------------------------------------------------------
# Timestamp part extraction (reference parses datetimes by string split
# `SemiSupervisedAndBaseClassifiers.scala:881-892`; testdata has real
# timestamps so we use native month/day/hour + fractional hour).
# ---------------------------------------------------------------------------

TS_PARTS_ORACLE = """
SELECT CAST(month(ts) AS BIGINT) AS ts_month,
       CAST(day(ts) AS BIGINT) AS ts_day,
       COUNT(*) AS n,
       ROUND(AVG(hour(ts) + minute(ts) / 60.0 + second(ts) / 3600.0), 4) AS avg_frac_hour
FROM events
GROUP BY 1, 2
"""


@register("ts_parts_histogram", TS_PARTS_ORACLE)
def ts_parts_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    frac_hour = (
        F.hour("ts") + F.minute("ts") / F.lit(60.0) + F.second("ts") / F.lit(3600.0)
    )
    return (
        events.groupBy(
            F.month("ts").cast("long").alias("ts_month"),
            F.dayofmonth("ts").cast("long").alias("ts_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(frac_hour), 4).alias("avg_frac_hour"),
        )
    )


# ---------------------------------------------------------------------------
# JSON property extraction (events.props; extension surface — the
# reference has no JSON, SURVEY §2.2 "array/map/json: not used").
# ---------------------------------------------------------------------------

JSON_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@register("json_extract_props", JSON_ORACLE)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# Grid-results join: the reference updates its results table with a tower
# of withColumn(when(4-key match)) projections
# (`FunctionsSemiSupervised.scala:203-253`) — a poor-man's join whose plan
# grows linearly with grid size. Re-expressed as the real thing: a
# broadcast LEFT join of the key template onto aggregated values, with
# COALESCE for missing cells.
# ---------------------------------------------------------------------------

GRID_JOIN_ORACLE = """
SELECT n.n_name,
       r.r_name,
       COALESCE(v.n_customers, 0) AS n_customers,
       COALESCE(v.total_acctbal, 0.0) AS total_acctbal
FROM nation n
JOIN region r ON n.n_regionkey = r.r_regionkey
LEFT JOIN (
  SELECT c_nationkey, COUNT(*) AS n_customers,
         ROUND(SUM(c_acctbal), 2) AS total_acctbal
  FROM customer GROUP BY c_nationkey
) v ON n.n_nationkey = v.c_nationkey
"""


@register("grid_results_join", GRID_JOIN_ORACLE)
def grid_results_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    values = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )
    template = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        template.join(values, template.n_nationkey == values.c_nationkey, "left")
        .select(
            "n_name",
            "r_name",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("total_acctbal", F.lit(0.0)).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Window function: top order per customer (rank/row_number — extension
# beyond the reference, which has no window functions; SURVEY §2.2).
# ---------------------------------------------------------------------------

RANK_ORACLE = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
) = 1
"""


@register("window_rank_top_order", RANK_ORACLE)
def window_rank_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )

"""Seventh relational coverage block: warehouse maintenance shapes —
SCD2 validity-interval construction and RFM customer segmentation.

Reference parity: the reference's relational surface (DataFrame
select/filter/groupBy/window over the cleaned datasets,
``FunctionsSemiSupervised.scala:32-330``) never materializes history
tables, but both shapes here are pure compositions of primitives it
does exercise (window lead/row_number, groupBy agg, broadcast join)
applied to the classic warehouse-maintenance topologies a pipeline on
this engine would run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

# SCD2 (slowly-changing-dimension type 2) validity intervals: each
# customer's order stream becomes a history of [valid_from, valid_to)
# rows, the last one open-ended (is_current=1). One shuffle on
# o_custkey; the window is evaluated within partitions, so the plan is
# Exchange(custkey) -> Sort -> Window — linear at any corpus size.
# The `% 100` keeper filter bounds the DEMO output (the driver
# collects results); it is pushed into the parquet scan, and the
# operator itself is the unfiltered window expression.
#
# Parity notes (see queries/__init__ conventions): timestamps are
# formatted to strings on both sides; the open interval's NULL
# valid_to is coalesced to a sentinel so the hash never sees NULL/NaN;
# is_current is cast to BIGINT (bool dtypes differ across engines).
SCD2_ORACLE = """
SELECT o_custkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       COALESCE(strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d'),
                '9999-12-31') AS valid_to,
       CAST(CASE WHEN LEAD(o_orderdate) OVER w IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current,
       ROUND(o_totalprice, 2) AS price
FROM orders
WHERE o_custkey % 100 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("order_history_scd2", SCD2_ORACLE)
def order_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: (o_custkey, seq, valid_from, valid_to,
    is_current, price) — open interval gets the 9999-12-31 sentinel."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_custkey") % 100 == 0
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        F.row_number().over(w).cast("bigint").alias("seq"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd"), F.lit("9999-12-31")
        ).alias("valid_to"),
        nxt.isNull().cast("bigint").alias("is_current"),
        F.round("o_totalprice", 2).alias("price"),
    )


# RFM segmentation: per-customer recency/frequency/monetary, bucketed
# into quartiles WITHIN each market segment (partitioned NTILE — never
# a single global window; at 100 TB the ordered domain is already one
# row per customer, and each segment's window sorts independently).
# Monetary is summed in integer CENTS (floor(price*100) per row, both
# engines) so quartile boundaries never depend on float summation
# order — a ULP flip near a boundary would otherwise swap NTILE
# assignments between engines.
RFM_ORACLE = """
WITH rfm AS (
  SELECT o.o_custkey,
         c.c_mktsegment,
         MAX(o.o_orderdate) AS last_ts,
         COUNT(*) AS freq,
         SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o.o_custkey, c.c_mktsegment
), scored AS (
  SELECT c_mktsegment, cents,
         NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY last_ts, o_custkey) AS r_q,
         NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY freq, o_custkey) AS f_q,
         NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY cents, o_custkey) AS m_q
  FROM rfm
)
SELECT c_mktsegment,
       r_q || '-' || f_q || '-' || m_q AS rfm_segment,
       COUNT(*)::BIGINT AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM scored
GROUP BY c_mktsegment, rfm_segment
"""


@register("rfm_segments", RFM_ORACLE)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mktsegment RFM quartile segmentation:
    (c_mktsegment, rfm_segment, n_customers, total_cents)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    # No broadcast hint on customer: it grows linearly with SF (the
    # largest TPC-H dim). AQE broadcasts it while it fits the threshold
    # and falls back to shuffle join when it doesn't — a hard hint
    # would force a >8 GB broadcast failure at the 100 TB design point.
    rfm = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("o_custkey", "c_mktsegment")
        .agg(
            F.max("o_orderdate").alias("last_ts"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents"),
        )
    )

    def _q(order_col: str) -> F.Column:
        w = Window.partitionBy("c_mktsegment").orderBy(order_col, "o_custkey")
        return F.ntile(4).over(w)

    scored = rfm.select(
        "c_mktsegment",
        "cents",
        _q("last_ts").alias("r_q"),
        _q("freq").alias("f_q"),
        _q("cents").alias("m_q"),
    )
    return scored.groupBy(
        "c_mktsegment",
        F.concat_ws("-", "r_q", "f_q", "m_q").alias("rfm_segment"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )


# Ratio-to-report ("percent of total") — the one classic reporting
# window topology the battery didn't pin: a windowed SUM over an
# ALREADY-AGGREGATED tiny relation (25 nation rows), so the window
# exchange moves group totals, never fact rows. Revenue is summed as
# integer cents (same quantize-then-rank rationale as rfm_segments);
# the share division is then BIGINT/BIGINT -> double, bit-identical in
# both engines, rounded finer than the data.
SHARE_ORACLE = """
WITH nat AS (
  SELECT r.r_name, n.n_name,
         SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS nation_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT r_name, n_name,
       CAST(nation_cents AS BIGINT) AS nation_cents,
       ROUND(CAST(nation_cents AS DOUBLE)
             / SUM(nation_cents) OVER (PARTITION BY r_name) * 100,
             4) AS share_pct
FROM nat
"""


@register("nation_revenue_share", SHARE_ORACLE)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: (r_name, n_name, nation_cents, share_pct) —
    each nation's percentage of its region's order revenue."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # customer is SF-linear: no hint (AQE decides); nation/region are
    # schema-bounded (25/5 rows) and keep theirs.
    nat = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("nation_cents")
        )
    )
    w = Window.partitionBy("r_name")
    return nat.select(
        "r_name",
        "n_name",
        "nation_cents",
        F.round(
            F.col("nation_cents").cast("double")
            / F.sum("nation_cents").over(w)
            * 100,
            4,
        ).alias("share_pct"),
    )


# Year-over-year growth: LAG over a two-level aggregate (nation x year
# revenue), the classic reporting topology the battery hadn't pinned.
# Revenue is integer cents (quantize-then-rank rule — here
# quantize-then-DIVIDE: the growth ratio is BIGINT/BIGINT -> double,
# bit-identical across engines); the first year's NULL growth is
# coalesced to a sentinel so the hash never compares None vs NaN.
# Scale: the window input is |nations| x |years| rows (schema-bounded
# x time-bounded), never fact rows.
YOY_ORACLE = """
WITH yearly AS (
  SELECT n.n_name,
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, year(o.o_orderdate)
)
SELECT n_name, o_year,
       CAST(cents AS BIGINT) AS cents,
       COALESCE(
         ROUND(CAST(cents AS DOUBLE)
               / LAG(cents) OVER (PARTITION BY n_name ORDER BY o_year)
               - 1, 4),
         -999.0) AS yoy_growth
FROM yearly
"""


@register("nation_yoy_revenue_growth", YOY_ORACLE)
def nation_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation:
    (n_name, o_year, cents, yoy_growth) — first year gets -999.0."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    yearly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    return yearly.select(
        "n_name",
        "o_year",
        "cents",
        F.coalesce(
            F.round(
                F.col("cents").cast("double") / F.lag("cents").over(w) - 1, 4
            ),
            F.lit(-999.0),
        ).alias("yoy_growth"),
    )


# Bivariate statistics battery: corr / covar_samp / stddev_samp share
# the SAME sample definitions in Spark and DuckDB; rounding is coarse
# relative to summation-order ULP noise (relative ~1e-12 over these
# row counts) and fine relative to the values.
CORR_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
       ROUND(stddev_samp(l_extendedprice), 2) AS sd_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("stats_correlation_battery", CORR_ORACLE)
def stats_correlation_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag bivariate stats: (l_returnflag, n, corr_qty_price,
    covar_qty_price, sd_qty, sd_price) — one aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
    )


# SCD1 merge/upsert (operators/merge.py): apply a deterministic change
# set derived from orders itself — keys %1000==0 get a 10% price bump
# (updates), keys %1000==1 are re-keyed out of range (inserts) — then
# audit the merged relation per action. double*1.1 is one IEEE
# multiply, bit-identical across engines; cents are floored AFTER it.
MERGE_ORACLE = """
WITH updates AS (
  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice
  FROM orders WHERE o_orderkey % 1000 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice
  FROM orders WHERE o_orderkey % 1000 = 1
),
merged AS (
  SELECT CASE WHEN t.o_orderkey IS NULL THEN 'inserted'
              WHEN u.o_orderkey IS NOT NULL
                   AND u.o_totalprice IS DISTINCT FROM t.o_totalprice
                   THEN 'updated'
              ELSE 'unchanged' END AS merge_action,
         CASE WHEN u.o_orderkey IS NOT NULL
              THEN u.o_totalprice ELSE t.o_totalprice END AS price
  FROM orders t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
)
SELECT merge_action,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(price * 100) AS BIGINT)) AS BIGINT) AS cents
FROM merged GROUP BY merge_action
"""


@register("merge_upsert_orders", MERGE_ORACLE)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 merge audit: (merge_action, n, cents) after upserting a
    derived change set into orders via operators/merge.py (one
    full-outer key shuffle, no window, no driver state)."""
    from tfm_semisup_spark.operators.merge import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    bumped = orders.where(F.col("o_orderkey") % 1000 == 0).select(
        "o_orderkey", (F.col("o_totalprice") * 1.1).alias("o_totalprice")
    )
    fresh = orders.where(F.col("o_orderkey") % 1000 == 1).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_totalprice",
    )
    merged = merge_upsert(
        orders, bumped.unionByName(fresh), ["o_orderkey"], ["o_totalprice"]
    )
    return (
        merged.groupBy(F.col("__merge_action").alias("merge_action"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            ).cast("bigint").alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# Robust/summary statistics: winsorization + fixed-bin histogram
# ---------------------------------------------------------------------------
#
# Winsorized mean — the standard heavy-tail-robust aggregate in metric
# pipelines: clip at the exact p01/p99 before averaging. Both engines
# use the same linear-interpolation exact quantile definition
# (Spark `percentile`, DuckDB `quantile_cont`: index = p*(n-1)), so
# the clip bounds are bit-identical; the bounds are a single row
# broadcast against the fact scan (never a shuffle). Averages rounded
# 4 dp (summation-order ULP, same convention as pricing_summary).

WINSOR_ORACLE = """
WITH b AS (
  SELECT quantile_cont(o_totalprice, 0.01) AS lo,
         quantile_cont(o_totalprice, 0.99) AS hi
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN o_totalprice < lo OR o_totalprice > hi
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       ROUND(AVG(LEAST(GREATEST(o_totalprice, lo), hi)), 4) AS winsorized_avg,
       ROUND(AVG(o_totalprice), 4) AS raw_avg
FROM orders, b
GROUP BY o_orderstatus, lo, hi
"""


@register("winsorized_price_stats", WINSOR_ORACLE)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status winsorized vs raw mean of o_totalprice with exact
    p01/p99 clip bounds: (o_orderstatus, n, n_clipped, winsorized_avg,
    raw_avg)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = F.broadcast(
        orders.agg(
            F.expr("percentile(o_totalprice, 0.01)").alias("lo"),
            F.expr("percentile(o_totalprice, 0.99)").alias("hi"),
        )
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    is_out = (F.col("o_totalprice") < F.col("lo")) | (
        F.col("o_totalprice") > F.col("hi")
    )
    return (
        orders.crossJoin(bounds)
        .groupBy("o_orderstatus", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias("n_clipped"),
            F.round(F.avg(clipped), 4).alias("winsorized_avg"),
            F.round(F.avg("o_totalprice"), 4).alias("raw_avg"),
        )
        .drop("lo", "hi")
    )


# Fixed-bin histogram over the global [min, max] range. The bucket
# index is a SHARED floor expression (not width_bucket) so both
# engines run byte-identical arithmetic — a value sitting exactly on a
# bin boundary lands in the same bin everywhere by construction.
# Single-row min/max broadcast + one aggregate: two scans, no shuffle
# beyond the 20-row bucket agg.

_HIST_BUCKET = (
    "least(cast(floor((o_totalprice - lo) / (hi - lo) * 20) AS BIGINT), 19)"
)

HISTOGRAM_ORACLE = f"""
WITH b AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
)
SELECT {_HIST_BUCKET} AS bucket,
       COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS bin_min,
       ROUND(MAX(o_totalprice), 2) AS bin_max
FROM orders, b
GROUP BY 1
"""


@register("price_histogram_bins", HISTOGRAM_ORACLE)
def price_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of o_totalprice over the observed
    range: (bucket, n, bin_min, bin_max)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = F.broadcast(
        orders.agg(
            F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
        )
    )
    return (
        orders.crossJoin(bounds)
        .groupBy(F.expr(_HIST_BUCKET).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured extraction (Spark 4 surface)
# ---------------------------------------------------------------------------
#
# Spark 4's VARIANT type is the engine-native semi-structured path
# (parse once into a binary-encoded document, typed variant_get
# extraction — the modern replacement for stringly get_json_object in
# hot paths: parsing happens ONCE per row, extractions are O(field)
# on the encoded form). This query runs the events.props JSON through
# parse_json -> variant_get('$.k','long') and aggregates per event
# type; the DuckDB oracle extracts the same field with its native JSON
# path. Counts/sums are exact integers.

VARIANT_ORACLE = """
SELECT event_type,
       COUNT(*)::BIGINT AS n_events,
       COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT
         AS n_items,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS max_k
FROM events
GROUP BY event_type
"""


@register("variant_props_extract", VARIANT_ORACLE)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction through Spark 4's VARIANT: parse_json(props) →
    variant_get('$.k') → per-event-type stats
    (event_type, n_events, n_items, sum_k, min_k, max_k)."""
    events = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(v, '$.k', 'long')")
    return (
        events.select("event_type", F.parse_json("props").alias("v"))
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("k").cast("bigint").alias("n_items"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# unpivot/melt API surface (wide metrics -> long)
# ---------------------------------------------------------------------------
#
# The DataFrame-native ``df.unpivot`` (melt) — the inverse of pivot and
# the long-format export every metrics store wants. Distinct from the
# stack() SQL expression used elsewhere: this covers the typed API
# (ids/values/variable/value names), which compiles to the same Expand
# node. Values are unified to BIGINT cents/counts so the long column
# is one exact type.

UNPIVOT_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         COUNT(*)::BIGINT AS n_orders,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))::BIGINT
           AS revenue_cents,
         MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT))::BIGINT
           AS max_price_cents
  FROM orders
  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01'
                                      AND DATE '1995-01-31'
  GROUP BY 1
)
SELECT CAST(day AS VARCHAR) AS day, metric, value FROM (
  SELECT day, 'n_orders' AS metric, n_orders AS value FROM daily
  UNION ALL
  SELECT day, 'revenue_cents', revenue_cents FROM daily
  UNION ALL
  SELECT day, 'max_price_cents', max_price_cents FROM daily
)
"""


@register("unpivot_daily_metrics", UNPIVOT_ORACLE)
def unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide daily metrics melted long via ``df.unpivot``:
    (day, metric, value) over one bounded month."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    daily = (
        orders.select(F.to_date("o_orderdate").alias("day"), cents.alias("c"))
        .where(
            (F.col("day") >= F.lit("1995-01-01"))
            & (F.col("day") <= F.lit("1995-01-31"))
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("c").cast("bigint").alias("revenue_cents"),
            F.max("c").cast("bigint").alias("max_price_cents"),
        )
    )
    return daily.unpivot(
        ids=["day"],
        values=["n_orders", "revenue_cents", "max_price_cents"],
        variableColumnName="metric",
        valueColumnName="value",
    ).select(F.col("day").cast("string").alias("day"), "metric", "value")


# ---------------------------------------------------------------------------
# Snapshot diff report (CDC-style table comparison)
# ---------------------------------------------------------------------------
#
# The data-versioning primitive behind incremental pipelines: given two
# snapshots of a keyed table, report added / removed / changed /
# unchanged rows plus per-column change counts and the exact value
# delta. Derived deterministically from one orders scan so the driver
# can oracle it: OLD excludes key-hash bucket 3 of 11, NEW excludes
# bucket 7 and bumps the price by $1 on every hash%5==0 row — the diff
# therefore contains all four outcomes with known structure.
#
# 100 TB shape: ONE full-outer join on the key (the SCD1/merge
# shuffle), column compares as integer cents — never double equality;
# the report is a single-row aggregate.

from tfm_semisup_spark.operators.layout import (  # noqa: E402
    md5_uniform16_spark_sql,
    md5_uniform16_sql,
)

_SNAP_MD5 = "md5(CAST(o_orderkey AS STRING))"
_SNAP_H_SQL = md5_uniform16_sql(_SNAP_MD5)
_SNAP_H_SPARK = md5_uniform16_spark_sql(_SNAP_MD5)

SNAPSHOT_DIFF_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st, o_orderpriority AS pr,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
         {_SNAP_H_SQL} AS h
  FROM orders
),
old AS (SELECT k, st, pr, cents FROM base WHERE h % 11 <> 3),
new AS (
  SELECT k, st, pr,
         cents + CASE WHEN h % 5 = 0 THEN 100 ELSE 0 END AS cents
  FROM base WHERE h % 11 <> 7
),
d AS (
  SELECT o.k AS ko, n.k AS kn,
         o.st AS st_o, n.st AS st_n, o.pr AS pr_o, n.pr AS pr_n,
         o.cents AS c_o, n.cents AS c_n
  FROM old o FULL OUTER JOIN new n ON o.k = n.k
)
SELECT SUM(CASE WHEN ko IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_added,
       SUM(CASE WHEN kn IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                 AND (st_o <> st_n OR pr_o <> pr_n OR c_o <> c_n)
                THEN 1 ELSE 0 END)::BIGINT AS n_changed,
       SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                 AND st_o = st_n AND pr_o = pr_n AND c_o = c_n
                THEN 1 ELSE 0 END)::BIGINT AS n_unchanged,
       SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                 AND c_o <> c_n THEN 1 ELSE 0 END)::BIGINT
         AS n_price_changed,
       SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                 AND st_o <> st_n THEN 1 ELSE 0 END)::BIGINT
         AS n_status_changed,
       SUM(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL
                THEN c_n - c_o ELSE 0 END)::BIGINT AS cents_delta_sum
FROM d
"""


@register("snapshot_diff_report", SNAPSHOT_DIFF_ORACLE)
def snapshot_diff_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed diff between two deterministic snapshots of orders:
    (n_added, n_removed, n_changed, n_unchanged, n_price_changed,
    n_status_changed, cents_delta_sum)."""
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").alias("pr"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.expr(_SNAP_H_SPARK).alias("h"),
    )
    old = base.where(F.col("h") % 11 != 3).select("k", "st", "pr", "cents")
    new = base.where(F.col("h") % 11 != 7).select(
        "k",
        "st",
        "pr",
        (
            F.col("cents")
            + F.when(F.col("h") % 5 == 0, 100).otherwise(0)
        ).alias("cents"),
    )
    d = old.alias("o").join(
        new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer"
    )
    both = F.col("o.k").isNotNull() & F.col("n.k").isNotNull()
    changed = (
        (F.col("o.st") != F.col("n.st"))
        | (F.col("o.pr") != F.col("n.pr"))
        | (F.col("o.cents") != F.col("n.cents"))
    )
    return d.agg(
        F.sum(F.when(F.col("o.k").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_added"),
        F.sum(F.when(F.col("n.k").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.sum(F.when(both & changed, 1).otherwise(0))
        .cast("bigint")
        .alias("n_changed"),
        F.sum(F.when(both & ~changed, 1).otherwise(0))
        .cast("bigint")
        .alias("n_unchanged"),
        F.sum(F.when(both & (F.col("o.cents") != F.col("n.cents")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_price_changed"),
        F.sum(F.when(both & (F.col("o.st") != F.col("n.st")), 1).otherwise(0))
        .cast("bigint")
        .alias("n_status_changed"),
        F.sum(
            F.when(both, F.col("n.cents") - F.col("o.cents")).otherwise(0)
        )
        .cast("bigint")
        .alias("cents_delta_sum"),
    )


# ---------------------------------------------------------------------------
# Per-segment OLS trend with R²
# ---------------------------------------------------------------------------
#
# Extends the r6 slope-only OLS (per_nation_price_trend_ols) to the
# full regression readout — slope, intercept, and R² of order value
# against time per market segment. x = epoch day (exact integer),
# y = integer cents; the five moment sums are exact DECIMAL/HUGEINT,
# and slope/intercept/R² are assembled in one fixed double tree
# (slope = Sxy/Sxx, intercept = (Σy − b·Σx)/n, R² = Sxy²/(Sxx·Syy)
# with Sxy = nΣxy − ΣxΣy etc.).

OLS_R2_ORACLE = """
WITH pts AS (
  SELECT c.c_mktsegment AS segment,
         CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS x,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
m AS (
  SELECT segment, COUNT(*)::HUGEINT AS n,
         SUM(x)::HUGEINT AS sx, SUM(y)::HUGEINT AS sy,
         SUM(x::HUGEINT * x)::HUGEINT AS sxx,
         SUM(y::HUGEINT * y)::HUGEINT AS syy,
         SUM(x::HUGEINT * y)::HUGEINT AS sxy
  FROM pts GROUP BY segment
)
SELECT segment,
       n::BIGINT AS n_orders,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_day,
       ROUND((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept_cents,
       ROUND((CAST(n * sxy - sx * sy AS DOUBLE)
              * CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r_squared
FROM m
"""


@register("per_segment_ols_r2", OLS_R2_ORACLE)
def per_segment_ols_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full OLS readout of order value vs time per market segment:
    (segment, n_orders, slope_cents_per_day, intercept_cents,
    r_squared)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    pts = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        # TZ-free day number (datediff, never unix_timestamp — the
        # latter is session-timezone-dependent)
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("x"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = pts.groupBy("segment").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vxx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vyy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / vxx
    return m.select(
        "segment",
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(slope, 6).alias("slope_cents_per_day"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            6,
        ).alias("intercept_cents"),
        F.round(num * num / (vxx * vyy), 6).alias("r_squared"),
    )

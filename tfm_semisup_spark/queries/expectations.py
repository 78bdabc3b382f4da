"""Data-quality expectation suite (Deequ/Great-Expectations shape).

Production pipelines gate every ingestion batch on declarative
constraints — completeness, uniqueness, domain membership, bounds,
volume anomalies. The Spark-first property that matters at 100 TB:
ALL scalar metrics compute in ONE aggregate pass over the table (one
scan, map-side partial aggregation), then unpivot to the one-row-per-
constraint report with ``stack`` — never one scan per constraint,
which is how naive expectation suites go quadratic in practice.

Two queries:
- ``constraint_audit_orders``: five constraint families over orders
  in a single scan.
- ``partition_anomaly_days``: daily volume z-scores over events (the
  freshness/volume check) — per-day counts vs the table's own
  mean/stddev, one aggregate plus a one-row broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

_DEC = "decimal(38,0)"

CONSTRAINT_ORACLE = """
WITH m AS (
  SELECT COUNT(*)::DOUBLE AS row_count,
         AVG(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END)
           AS completeness_custkey,
         COUNT(DISTINCT o_orderkey)::DOUBLE / COUNT(*) AS uniqueness_orderkey,
         MIN(o_totalprice) AS min_totalprice,
         AVG(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 1.0 ELSE 0.0 END)
           AS status_in_domain
  FROM orders
)
SELECT c.constraint, c.metric, c.passed FROM (
  SELECT 'completeness_custkey' AS constraint,
         round(completeness_custkey, 6) AS metric,
         completeness_custkey = 1.0 AS passed FROM m
  UNION ALL
  SELECT 'min_totalprice_nonneg', round(min_totalprice, 6),
         min_totalprice >= 0.0 FROM m
  UNION ALL
  SELECT 'row_count_nonempty', round(row_count, 6), row_count > 0 FROM m
  UNION ALL
  SELECT 'status_in_domain', round(status_in_domain, 6),
         status_in_domain = 1.0 FROM m
  UNION ALL
  SELECT 'uniqueness_orderkey', round(uniqueness_orderkey, 6),
         uniqueness_orderkey = 1.0 FROM m
) c
ORDER BY c.constraint
"""


@register("constraint_audit_orders", CONSTRAINT_ORACLE)
def constraint_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(constraint, metric, passed) — five expectation families over
    orders computed in ONE scan, unpivoted with stack."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.agg(
        F.count(F.lit(1)).cast("double").alias("row_count"),
        F.avg(
            F.when(F.col("o_custkey").isNotNull(), 1.0).otherwise(0.0)
        ).alias("completeness_custkey"),
        (
            F.count_distinct(F.col("o_orderkey")).cast("double")
            / F.count(F.lit(1))
        ).alias("uniqueness_orderkey"),
        F.min("o_totalprice").alias("min_totalprice"),
        F.avg(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1.0).otherwise(0.0)
        ).alias("status_in_domain"),
    )
    return (
        m.selectExpr(
            """stack(5,
              'completeness_custkey', round(completeness_custkey, 6),
                  completeness_custkey = 1.0D,
              'min_totalprice_nonneg', round(min_totalprice, 6),
                  min_totalprice >= 0.0D,
              'row_count_nonempty', round(row_count, 6), row_count > 0.0D,
              'status_in_domain', round(status_in_domain, 6),
                  status_in_domain = 1.0D,
              'uniqueness_orderkey', round(uniqueness_orderkey, 6),
                  uniqueness_orderkey = 1.0D
            ) AS (constraint, metric, passed)"""
        )
        .orderBy("constraint")
    )


ANOMALY_Z = 2.0

PARTITION_ANOMALY_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*)::BIGINT AS n_events
  FROM events GROUP BY 1
),
stats AS (
  SELECT AVG(n_events) AS mu, STDDEV_SAMP(n_events) AS sigma FROM daily
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       d.n_events,
       round((d.n_events - s.mu) / s.sigma, 4) AS z,
       abs(d.n_events - s.mu) > {ANOMALY_Z} * s.sigma AS anomalous
FROM daily d CROSS JOIN stats s
ORDER BY day
"""


@register("partition_anomaly_days", PARTITION_ANOMALY_ORACLE)
def partition_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event volume with z-score vs the table's own mean/std:
    (day, n_events, z, anomalous). One aggregate + a one-row join."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    stats = F.broadcast(
        daily.agg(
            F.avg("n_events").alias("mu"),
            F.stddev_samp("n_events").alias("sigma"),
        )
    )
    return (
        daily.crossJoin(stats)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.round((F.col("n_events") - F.col("mu")) / F.col("sigma"), 4).alias(
                "z"
            ),
            (
                F.abs(F.col("n_events") - F.col("mu"))
                > ANOMALY_Z * F.col("sigma")
            ).alias("anomalous"),
        )
        .orderBy("day")
    )


# Column profiling (the authoring half of the expectations workflow):
# completeness, exact cardinality, and portable-string extrema for a
# fixed column set, one row per column, ONE scan (the k-way
# count_distinct plans as an Expand ahead of a single exchange —
# operators/profiling.py docstring has the scale notes).
_PROFILE_COLS = [
    "o_orderstatus",
    "o_orderpriority",
    "o_custkey",
    "o_totalprice",
    "o_orderdate",
]


def _profile_oracle() -> str:
    def leg(c: str) -> str:
        if c == "o_totalprice":
            mn, mx = f"printf('%.4f', MIN({c}))", f"printf('%.4f', MAX({c}))"
        elif c == "o_orderdate":
            mn = f"strftime(MIN({c}), '%Y-%m-%d %H:%M:%S')"
            mx = f"strftime(MAX({c}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn, mx = f"CAST(MIN({c}) AS VARCHAR)", f"CAST(MAX({c}) AS VARCHAR)"
        return (
            f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(COUNT({c}) AS BIGINT) AS n_nonnull,"
            f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_value, {mx} AS max_value FROM orders"
        )

    return "\nUNION ALL\n".join(leg(c) for c in _PROFILE_COLS)


@register("profile_orders_columns", _profile_oracle())
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of orders: (col_name, n_rows, n_nonnull,
    n_distinct, min_value, max_value) — one aggregation pass via
    operators/profiling.py."""
    from tfm_semisup_spark.operators.profiling import profile_columns

    return profile_columns(
        load_table(spark, sf_dir, "orders"), _PROFILE_COLS
    )


@register("profile_orders_columns_approx")
def profile_orders_columns_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate profiling tier (VERDICT r5 #6): same single-scan
    profile with approx_count_distinct (HLL++, rsd=0.05) in place of
    exact count_distinct — the plan drops the k-way Expand, the read
    shape for extreme-cardinality columns at 100 TB. Rows-only: the
    HLL estimate is deterministic (sketch merge is order-insensitive)
    but not reproducible in DuckDB's approx algorithm; the error bound
    vs the exact tier is pinned by
    tests/test_plan_shapes_r6.py::test_profile_approx_within_rsd."""
    from tfm_semisup_spark.operators.profiling import profile_columns

    return profile_columns(
        load_table(spark, sf_dir, "orders"), _PROFILE_COLS, approx=True
    )


# Referential-integrity audit (the Deequ check family the constraint
# suite didn't cover): orphan counts for every foreign key in the
# star schema, one row per FK edge. Each leg is an ANTI join keyed on
# the FK — shuffles on the key (or broadcasts the schema-bounded
# side), no fact-fact products; the synthetic data is intact, so the
# expected counts are zero, which is exactly what the audit asserts
# in production too.
RI_ORACLE = """
SELECT 'orders.o_custkey->customer' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'lineitem.l_orderkey->orders', CAST(COUNT(*) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT 'lineitem.l_partkey->part', CAST(COUNT(*) AS BIGINT)
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_partkey IS NULL
UNION ALL
SELECT 'lineitem.l_suppkey->supplier', CAST(COUNT(*) AS BIGINT)
FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE s.s_suppkey IS NULL
UNION ALL
SELECT 'customer.c_nationkey->nation', CAST(COUNT(*) AS BIGINT)
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_nationkey IS NULL
"""


@register("referential_integrity_audit", RI_ORACLE)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan counts per FK edge: (fk, n_orphans) — five anti-join
    legs unioned; all zero on intact data."""
    edges = [
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for fk, child, ck, parent, pk in edges:
        c = load_table(spark, sf_dir, child).select(ck)
        p = load_table(spark, sf_dir, parent).select(pk)
        leg = (
            c.join(p, c[ck] == p[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            .select(F.lit(fk).alias("fk"), "n_orphans")
        )
        out = leg if out is None else out.unionByName(leg)
    return out


# ---------------------------------------------------------------------------
# Robust (MAD-based) outlier detection
# ---------------------------------------------------------------------------
#
# The robust twin of partition_anomaly_days' z-scores: median/MAD are
# insensitive to the outliers they hunt (a single 1e9 sensor glitch
# inflates a stddev threshold but not a median one). Both engines use
# the same exact interpolated median, so the thresholds are
# bit-identical. Scale shape: two per-type median aggregates (the
# event_type domain is value-bounded, so the stats rows broadcast back
# against the fact scan) + one final counting pass — three scans, no
# fact-sized shuffle.

MAD_ORACLE = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, m.med, median(ABS(e.value - m.med)) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type, m.med
)
SELECT e.event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN ABS(e.value - m.med) > 3 * 1.4826 * m.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(m.med, 4) AS median_value,
       ROUND(m.mad, 4) AS mad_value
FROM events e JOIN mad m USING (event_type)
GROUP BY e.event_type, m.med, m.mad
"""


@register("robust_outlier_mad", MAD_ORACLE)
def robust_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust outlier counts: |value - median| > 3 * 1.4826 *
    MAD (the normal-consistent MAD scale). Output (event_type, n,
    n_outliers, median_value, mad_value)."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    is_out = F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")
    return (
        events.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "n_outliers",
            F.round("med", 4).alias("median_value"),
            F.round("mad", 4).alias("mad_value"),
        )
    )


# ---------------------------------------------------------------------------
# Order-insensitive table fingerprint (anti-entropy checksum)
# ---------------------------------------------------------------------------
#
# The data-integrity primitive behind replica anti-entropy, snapshot
# diffing, and migration sign-off: a content checksum of a relation
# that any engine can recompute and that is INDEPENDENT of row order
# and partitioning. Construction: canonicalize each row to a string
# of integer-only fields (keys + cents — no double formatting, the
# cross-engine trap), md5 it, decode two independent 16-bit slices,
# and SUM them (addition is commutative/associative — the order-free
# combine; two slices make silent collision-cancellation vastly less
# likely than one). 65535 per row per slice bounds the BIGINT sum to
# ~1e14 rows — far past any driver check. A single changed, missing,
# or duplicated row shifts the sums with probability ~1-2^-32.
#
# 100 TB: one scan, map-side partial SUM, a few-bytes shuffle. The
# same fingerprint computed per PARTITION KEY (here: per status)
# localizes WHICH shard diverges — the Merkle-ish use.

_FP_CANON = (
    "CAST(o_orderkey AS {s}) || '|' || "
    "CAST(o_custkey AS {s}) || '|' || "
    "o_orderstatus || '|' || "
    "CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS {s}) || '|' || "
    "strftime(o_orderdate, '%Y-%m-%d')"
)

TABLE_FP_ORACLE = f"""
WITH canon AS (
  SELECT o_orderstatus AS status,
         md5({_FP_CANON.format(s="VARCHAR")}) AS h
  FROM orders
)
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({{u1}}) AS BIGINT) AS fp_lo,
       CAST(SUM({{u2}}) AS BIGINT) AS fp_hi
FROM canon
GROUP BY status
"""


def _table_fp_oracle() -> str:
    from tfm_semisup_spark.operators.layout import md5_uniform16_sql

    return TABLE_FP_ORACLE.format(
        u1=md5_uniform16_sql("h", start=1), u2=md5_uniform16_sql("h", start=9)
    )


@register("table_fingerprint_orders", _table_fp_oracle())
def table_fingerprint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status order-insensitive content fingerprint of orders:
    (status, n_rows, fp_lo, fp_hi) — any engine recomputes it; any
    changed/missing/duplicated row shifts the sums."""
    from tfm_semisup_spark.operators.layout import md5_uniform16_spark_sql

    orders = load_table(spark, sf_dir, "orders")
    # Spark's date formatter needs the Spark pattern; DuckDB uses
    # strftime — the FORMATTED VALUES are identical (yyyy-MM-dd)
    canon_spark = (
        "CAST(o_orderkey AS STRING) || '|' || "
        "CAST(o_custkey AS STRING) || '|' || "
        "o_orderstatus || '|' || "
        "CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS STRING) || '|' || "
        "date_format(o_orderdate, 'yyyy-MM-dd')"
    )
    canon = orders.selectExpr(
        "o_orderstatus AS status", f"md5({canon_spark}) AS h"
    )
    u1 = md5_uniform16_spark_sql("h", start=1)
    u2 = md5_uniform16_spark_sql("h", start=9)
    return (
        canon.selectExpr("status", f"{u1} AS s1", f"{u2} AS s2")
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("s1").cast("bigint").alias("fp_lo"),
            F.sum("s2").cast("bigint").alias("fp_hi"),
        )
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit (r10)
# ---------------------------------------------------------------------------
#
# The privacy-governance counterpart of the expectations battery
# (Sweeney 2002; Machanavajjhala 2007): treat (priority, order month,
# customer nation) as the quasi-identifier, o_orderstatus as the
# sensitive attribute, and report per-k-threshold how much of the
# table would survive k-anonymity and whether equivalence classes
# carry sensitive diversity:
#   (k, n_classes_below_k, n_rows_below_k, pct_rows_at_risk,
#    min_l_diversity)
# where min_l_diversity = the minimum count of DISTINCT sensitive
# values over classes of size >= k. All counting is exact integer; the
# one double is the 6-dp percentage.
#
# Scale shape: ONE groupBy onto the quasi-identifier grid (bounded:
# 5 priorities x 12 months x 25 nations), then per-threshold rollups on
# that grid against a 3-row broadcast threshold list.

_KANON_KS = [2, 5, 10]

K_ANONYMITY_ORACLE = f"""
WITH qi AS (
  SELECT o.o_orderpriority AS qi_priority,
         EXTRACT(month FROM o.o_orderdate)::BIGINT AS qi_month,
         c.c_nationkey AS qi_nation,
         o.o_orderstatus AS sensitive
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
classes AS (
  SELECT qi_priority, qi_month, qi_nation,
         COUNT(*)::BIGINT AS csize,
         COUNT(DISTINCT sensitive)::BIGINT AS ldiv
  FROM qi GROUP BY 1, 2, 3
),
tot AS (SELECT SUM(csize)::BIGINT AS n_rows FROM classes),
ks AS (SELECT UNNEST([{", ".join(str(k) for k in _KANON_KS)}]) AS k)
SELECT ks.k::BIGINT AS k,
       SUM(CASE WHEN c.csize < ks.k THEN 1 ELSE 0 END)::BIGINT
         AS n_classes_below_k,
       SUM(CASE WHEN c.csize < ks.k THEN c.csize ELSE 0 END)::BIGINT
         AS n_rows_below_k,
       ROUND(CAST(SUM(CASE WHEN c.csize < ks.k THEN c.csize ELSE 0 END)
                  AS DOUBLE) * 100.0 / CAST(MIN(t.n_rows) AS DOUBLE), 6)
         AS pct_rows_at_risk,
       COALESCE(MIN(CASE WHEN c.csize >= ks.k THEN c.ldiv END), 0)::BIGINT
         AS min_l_diversity
FROM ks CROSS JOIN classes c CROSS JOIN tot t
GROUP BY ks.k
"""


@register("k_anonymity_audit", K_ANONYMITY_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the (priority, month,
    nation) quasi-identifier: (k, n_classes_below_k, n_rows_below_k,
    pct_rows_at_risk, min_l_diversity)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    qi = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select(
        F.col("o_orderpriority").alias("qi_priority"),
        F.month("o_orderdate").cast("bigint").alias("qi_month"),
        F.col("c_nationkey").alias("qi_nation"),
        F.col("o_orderstatus").alias("sensitive"),
    )
    classes = qi.groupBy("qi_priority", "qi_month", "qi_nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("csize"),
        F.countDistinct("sensitive").cast("bigint").alias("ldiv"),
    )
    tot = classes.agg(F.sum("csize").cast("bigint").alias("n_rows"))
    ks = spark.createDataFrame([(k,) for k in _KANON_KS], "k long")
    below = F.col("csize") < F.col("k")
    return (
        ks.crossJoin(classes)
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.sum(F.when(below, 1).otherwise(0))
            .cast("bigint")
            .alias("n_classes_below_k"),
            F.sum(F.when(below, F.col("csize")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_below_k"),
            F.round(
                F.sum(F.when(below, F.col("csize")).otherwise(0)).cast(
                    "double"
                )
                * 100.0
                / F.min("n_rows").cast("double"),
                6,
            ).alias("pct_rows_at_risk"),
            F.coalesce(
                F.min(F.when(~below, F.col("ldiv"))), F.lit(0)
            )
            .cast("bigint")
            .alias("min_l_diversity"),
        )
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_classes_below_k",
            "n_rows_below_k",
            "pct_rows_at_risk",
            "min_l_diversity",
        )
    )


# ---------------------------------------------------------------------------
# t-closeness audit (r11) — the third leg of the privacy tier
# ---------------------------------------------------------------------------
#
# Li, Li & Venkatasubramanian 2007: k-anonymity bounds class size,
# l-diversity bounds distinct sensitive values, t-closeness bounds the
# DISTANCE between each equivalence class's sensitive-attribute
# distribution and the global one — for an ORDERED attribute the Earth
# Mover's Distance
#
#   EMD(p, q) = (1/(m-1)) · Σ_{i<m} | Σ_{j<=i} (p_j - q_j) |
#
# over m ordered buckets. Classes are the (priority, month) QI grid;
# the sensitive attribute is order value bucketed into m=8 equal-width
# cent ranges (bucket = (cents·8) // (max+1), exact integer).
#
# Arithmetic parity: per prefix i the signed mass difference is the
# exact integer cum_c_i·N − cum_g_i·n_c (clearing both denominators),
# so EMD quantizes to t_ppm = Σ|d_i|·10⁶ // (n_c·N·(m−1)) with one
# exact integer division — no doubles anywhere. The partial sums run
# on the completed class×bucket grid (bounded: ≤ 60·8 rows at any
# data scale; completion via cross join so missing buckets carry
# p_j = 0 correctly).

_TCLOSE_M = 8
_TCLOSE_TOP = 10
_TCLOSE_SCALE = 1_000_000

T_CLOSENESS_ORACLE = f"""
WITH vals AS (
  SELECT o_orderpriority AS qi_priority,
         EXTRACT(month FROM o_orderdate)::BIGINT AS qi_month,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
mx AS (SELECT MAX(cents)::HUGEINT AS maxc FROM vals),
bucketed AS (
  SELECT qi_priority, qi_month,
         CAST((v.cents * {_TCLOSE_M}) // (m.maxc + 1) AS BIGINT) AS b
  FROM vals v CROSS JOIN mx m
),
classes AS (
  SELECT DISTINCT qi_priority, qi_month FROM bucketed
),
buckets AS (SELECT UNNEST(range({_TCLOSE_M})) AS b),
cell AS (
  SELECT c.qi_priority, c.qi_month, k.b,
         COALESCE(cnt.n, 0)::HUGEINT AS n
  FROM classes c CROSS JOIN buckets k
  LEFT JOIN (
    SELECT qi_priority, qi_month, b, COUNT(*)::HUGEINT AS n
    FROM bucketed GROUP BY 1, 2, 3
  ) cnt ON cnt.qi_priority = c.qi_priority
       AND cnt.qi_month = c.qi_month AND cnt.b = k.b
),
gcum AS (
  SELECT b, SUM(SUM(n)) OVER (ORDER BY b) AS cum_g
  FROM cell GROUP BY b
),
gtot AS (SELECT SUM(n)::HUGEINT AS nn FROM cell),
ccum AS (
  SELECT qi_priority, qi_month, b,
         SUM(n) OVER (PARTITION BY qi_priority, qi_month ORDER BY b)
           AS cum_c,
         SUM(n) OVER (PARTITION BY qi_priority, qi_month) AS n_c
  FROM cell
),
diffs AS (
  SELECT c.qi_priority, c.qi_month, c.n_c,
         SUM(ABS(c.cum_c * t.nn - g.cum_g * c.n_c)) AS d_sum
  FROM ccum c
  JOIN gcum g ON c.b = g.b
  CROSS JOIN gtot t
  WHERE c.b < {_TCLOSE_M - 1}
  GROUP BY c.qi_priority, c.qi_month, c.n_c
)
SELECT d.qi_priority, d.qi_month,
       d.n_c::BIGINT AS class_size,
       CAST((d.d_sum * {_TCLOSE_SCALE})
            // (d.n_c * t.nn * {_TCLOSE_M - 1}) AS BIGINT)
         AS t_closeness_ppm
FROM diffs d CROSS JOIN gtot t
ORDER BY t_closeness_ppm DESC, d.qi_priority, d.qi_month
LIMIT {_TCLOSE_TOP}
"""


@register("t_closeness_audit", T_CLOSENESS_ORACLE)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TCLOSE_TOP} equivalence classes by ordered-EMD
    t-closeness: (qi_priority, qi_month, class_size,
    t_closeness_ppm) — exact integer EMD on the completed
    class×bucket grid."""
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.col("o_orderpriority").alias("qi_priority"),
        F.month("o_orderdate").cast("bigint").alias("qi_month"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    mx = vals.agg(F.max("cents").alias("maxc"))
    bucketed = vals.crossJoin(F.broadcast(mx)).select(
        "qi_priority",
        "qi_month",
        F.expr(f"(cents * {_TCLOSE_M}) div (maxc + 1)").alias("b"),
    )
    counts = bucketed.groupBy("qi_priority", "qi_month", "b").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n")
    )
    classes = counts.select("qi_priority", "qi_month").distinct()
    buckets = spark.range(_TCLOSE_M).select(F.col("id").alias("b"))
    cell = (
        classes.crossJoin(F.broadcast(buckets))
        .join(counts, ["qi_priority", "qi_month", "b"], "left_outer")
        .select(
            "qi_priority",
            "qi_month",
            "b",
            F.coalesce(F.col("n"), F.lit(0).cast(_DEC)).alias("n"),
        )
    )
    cell = cell.localCheckpoint(eager=True)
    wg = Window.orderBy("b")
    gcum = (
        cell.groupBy("b")
        .agg(F.sum("n").alias("nb"))
        .select("b", F.sum("nb").over(wg).alias("cum_g"))
    )
    gtot = cell.agg(F.sum("n").alias("nn"))
    wc = Window.partitionBy("qi_priority", "qi_month")
    ccum = cell.select(
        "qi_priority",
        "qi_month",
        "b",
        F.sum("n").over(wc.orderBy("b")).alias("cum_c"),
        F.sum("n")
        .over(wc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n_c"),
    )
    diffs = (
        ccum.where(F.col("b") < _TCLOSE_M - 1)
        .join(F.broadcast(gcum), "b")
        .crossJoin(F.broadcast(gtot))
        .groupBy("qi_priority", "qi_month", "n_c")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_c") * F.col("nn")
                    - F.col("cum_g") * F.col("n_c")
                )
            ).alias("d_sum")
        )
    )
    num = (F.col("d_sum") * F.lit(_TCLOSE_SCALE)).cast(_DEC)
    den = (
        F.col("n_c") * F.col("nn2") * F.lit(_TCLOSE_M - 1)
    ).cast(_DEC)
    scored = diffs.crossJoin(
        F.broadcast(gtot.select(F.col("nn").alias("nn2")))
    ).select(
        "qi_priority",
        "qi_month",
        F.col("n_c").cast("bigint").alias("class_size"),
        ((num - F.pmod(num, den)) / den)
        .cast("bigint")
        .alias("t_closeness_ppm"),
    )
    return scored.orderBy(
        F.col("t_closeness_ppm").desc(), "qi_priority", "qi_month"
    ).limit(_TCLOSE_TOP)


# ---------------------------------------------------------------------------
# Functional-dependency violation audit (r12)
# ---------------------------------------------------------------------------
#
# The FD-profiling member of the Deequ-style expectation family: for
# each candidate dependency A -> B, how many A-groups map to more than
# one distinct B (and how badly)? The schema-inference/data-contract
# readout next to the constraint and referential-integrity audits.
# One row per candidate: (fd, n_groups, n_violating, max_distinct_rhs,
# violation_share_q) — all exact integer counting; the share is a
# 10⁶-scaled floor division.
#
# Candidates span both polarity cases: o_orderkey -> o_custkey is a
# true key dependency (0 violations — pins the negative case), the
# other three are genuinely violated on this data.
#
# 100 TB shape: one (A)-keyed countDistinct aggregate per candidate —
# the wordcount shuffle — then 1-row summaries unioned on a bounded
# grid.

_FD_CANDIDATES = [
    # (name, table, lhs, rhs)
    ("orderkey->custkey", "orders", "o_orderkey", "o_custkey"),
    ("custkey->priority", "orders", "o_custkey", "o_orderpriority"),
    ("l_orderkey->suppkey", "lineitem", "l_orderkey", "l_suppkey"),
    ("l_partkey->suppkey", "lineitem", "l_partkey", "l_suppkey"),
]


def _fd_one_sql(name: str, table: str, lhs: str, rhs: str) -> str:
    return f"""SELECT '{name}' AS fd,
       COUNT(*)::BIGINT AS n_groups,
       SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
       MAX(nd)::BIGINT AS max_distinct_rhs,
       (SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000
        // COUNT(*))::BIGINT AS violation_share_q
FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS nd FROM {table} GROUP BY {lhs})"""


FD_ORACLE = "\nUNION ALL\n".join(
    _fd_one_sql(*cand) for cand in _FD_CANDIDATES
)


@register("fd_violation_audit", FD_ORACLE)
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate functional-dependency audit: (fd, n_groups,
    n_violating, max_distinct_rhs, violation_share_q) for four
    candidate A -> B dependencies over orders/lineitem."""
    tables = {
        "orders": load_table(spark, sf_dir, "orders"),
        "lineitem": load_table(spark, sf_dir, "lineitem"),
    }
    parts = []
    for name, table, lhs, rhs in _FD_CANDIDATES:
        grouped = tables[table].groupBy(lhs).agg(
            F.countDistinct(rhs).alias("nd")
        )
        parts.append(
            grouped.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating"),
                F.max("nd").cast("bigint").alias("max_distinct_rhs"),
            ).select(
                F.lit(name).alias("fd"),
                "n_groups",
                "n_violating",
                "max_distinct_rhs",
                F.expr("(n_violating * 1000000) div n_groups")
                .cast("bigint")
                .alias("violation_share_q"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

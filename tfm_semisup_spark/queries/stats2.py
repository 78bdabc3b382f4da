"""Statistical-insight battery #2: regression, association, and
forensic/time-series statistics over the warehouse tables.

Operators a data-profiling / analytics engine is expected to ship
(extension surface alongside ``relational7.py``'s correlation battery,
robust stats, and histogram):

- ``per_nation_price_trend_ols``: closed-form simple OLS (slope +
  intercept) of order price over time, per nation — the groupwise
  regression shape (``regr_slope``-style) expressed with
  covar_pop/var_pop so both engines share the identical estimator.
- ``mi_status_priority``: mutual-information / chi-square association
  audit between two categorical columns via their contingency table —
  the dependence screen a feature-selection or drift pipeline runs.
- ``benford_price_audit``: first-significant-digit distribution vs
  Benford's law with per-digit chi-square terms — the classic
  forensic data-quality screen.
- ``ewma_daily_revenue``: 12-day truncated exponentially-weighted
  moving average of daily revenue, re-expressed as a forward
  contribution explode (shuffle scales with |days|×12, never fact
  rows — same re-expression discipline as ``rolling_7d_active_users``,
  ``queries/analytics.py``).
- ``target_encode_priority``: leakage-safe out-of-fold smoothed target
  encoding (the ML-prep categorical-encoding staple), portable md5
  folds, all out-of-fold sums via window subtraction over the bounded
  fold×category grid.

Arithmetic parity notes:
- all money flows as integer cents (``FLOOR(price*100)`` BIGINT) until
  the final statistic, per the repo-wide quantize-then-derive rule;
- the EWMA weighted sum is EXACT BIGINT (integer weights 3^k*4^(11-k))
  — zero summation-order noise by construction (see the in-section
  note: a double-weighted first cut hit a rounding boundary);
- ln()/division outputs are rounded coarser than cross-engine libm ULP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

# ---------------------------------------------------------------------------
# Groupwise simple OLS: price trend per nation
# ---------------------------------------------------------------------------
#
# slope = covar_pop(x, y) / var_pop(x); intercept = avg(y) - slope*avg(x)
# with x = days since 1992-01-01 and y = o_totalprice. One fact-table
# aggregation after the orders->customer->nation join; nation is
# schema-bounded (25 rows) so the broadcast hint is policy-compliant
# (queries/tpch_shapes2.py:34-44), customer is left to AQE.

OLS_ORACLE = """
WITH pts AS (
  SELECT n.n_name,
         CAST(date_diff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE))
              AS DOUBLE) AS x,
         o.o_totalprice AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(covar_pop(x, y) / var_pop(x), 6) AS slope_per_day,
       ROUND(AVG(y) - covar_pop(x, y) / var_pop(x) * AVG(x), 2) AS intercept
FROM pts
GROUP BY n_name
"""


@register("per_nation_price_trend_ols", OLS_ORACLE)
def per_nation_price_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS trend of order price over time:
    (n_name, n_orders, slope_per_day, intercept)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    x = F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).cast("double")
    pts = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_name", x.alias("x"), F.col("o_totalprice").alias("y"))
    )
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return pts.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round(F.avg("y") - slope * F.avg("x"), 2).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Mutual information / chi-square between two categorical columns
# ---------------------------------------------------------------------------
#
# One fact-table aggregation builds the contingency table (|status| x
# |priority| <= 15 cells — schema-bounded); the marginals and total are
# unpartitioned window sums OVER THAT 15-ROW AGGREGATE, never fact
# rows (the bounded-domain exception the global-window audit allows).
# Counts stay exact integers into ln()/division, rounded at the end.

MI_ORACLE = """
WITH joint AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders
  GROUP BY o_orderstatus, o_orderpriority
),
marg AS (
  SELECT o_orderstatus, o_orderpriority, n,
         SUM(n) OVER (PARTITION BY o_orderstatus) AS n_s,
         SUM(n) OVER (PARTITION BY o_orderpriority) AS n_p,
         SUM(n) OVER () AS n_tot
  FROM joint
)
SELECT o_orderstatus, o_orderpriority,
       CAST(n AS BIGINT) AS n,
       ROUND(ln((CAST(n AS DOUBLE) * n_tot) / (CAST(n_s AS DOUBLE) * n_p)), 6)
         AS pmi,
       ROUND(POWER(n - CAST(n_s AS DOUBLE) * n_p / n_tot, 2)
             / (CAST(n_s AS DOUBLE) * n_p / n_tot), 4) AS chi2_term
FROM marg
"""


@register("mi_status_priority", MI_ORACLE)
def mi_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association audit between o_orderstatus and o_orderpriority:
    per contingency cell (o_orderstatus, o_orderpriority, n, pmi,
    chi2_term) — pointwise mutual information and the cell's
    chi-square contribution."""
    orders = load_table(spark, sf_dir, "orders")
    joint = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    n_s = F.sum("n").over(Window.partitionBy("o_orderstatus"))
    n_p = F.sum("n").over(Window.partitionBy("o_orderpriority"))
    n_tot = F.sum("n").over(Window.partitionBy())
    marg = joint.select(
        "o_orderstatus",
        "o_orderpriority",
        "n",
        n_s.alias("n_s"),
        n_p.alias("n_p"),
        n_tot.alias("n_tot"),
    )
    expected = F.col("n_s").cast("double") * F.col("n_p") / F.col("n_tot")
    return marg.select(
        "o_orderstatus",
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.log(
                (F.col("n").cast("double") * F.col("n_tot"))
                / (F.col("n_s").cast("double") * F.col("n_p"))
            ),
            6,
        ).alias("pmi"),
        F.round(F.pow(F.col("n") - expected, F.lit(2)) / expected, 4).alias(
            "chi2_term"
        ),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------
#
# The first significant digit comes from the CENTS INTEGER formatted as
# a string — integer-to-string is identical across engines, dodging
# double-formatting and log10-at-power-of-ten edge cases entirely.

BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit
  FROM orders
  WHERE o_totalprice > 0
),
obs AS (
  SELECT digit, COUNT(*) AS n, SUM(COUNT(*)) OVER () AS n_tot
  FROM digits GROUP BY digit
)
SELECT digit,
       CAST(n AS BIGINT) AS n,
       ROUND(CAST(n AS DOUBLE) / n_tot, 6) AS obs_freq,
       ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_freq,
       ROUND(POWER(n - n_tot * (ln(1.0 + 1.0 / digit) / ln(10.0)), 2)
             / (n_tot * (ln(1.0 + 1.0 / digit) / ln(10.0))), 4) AS chi2_term
FROM obs
"""


@register("benford_price_audit", BENFORD_ORACLE)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice vs
    Benford's law: (digit, n, obs_freq, benford_freq, chi2_term)."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    obs = (
        orders.where(F.col("o_totalprice") > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("n_tot", F.sum("n").over(Window.partitionBy()))
    )
    benford = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    expected = F.col("n_tot") * benford
    return obs.select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.col("n_tot"), 6).alias("obs_freq"),
        F.round(benford, 6).alias("benford_freq"),
        F.round(F.pow(F.col("n") - expected, F.lit(2)) / expected, 4).alias(
            "chi2_term"
        ),
    )


# ---------------------------------------------------------------------------
# 30-day truncated EWMA of daily revenue
# ---------------------------------------------------------------------------
#
# ewma(d) = sum_{k=0..11} alpha * (1-alpha)^k * cents(d - k), alpha=0.25.
# Re-expressed as a FORWARD CONTRIBUTION EXPLODE: each (day, cents) row
# emits 12 weighted contributions to days d..d+11, then one hash
# aggregate keyed by target day. The shuffle is |days|*12 rows of the
# DAILY AGGREGATE (time-bounded), never fact rows — the same sliding-
# window re-expression as rolling_7d_active_users; no unpartitioned
# window, no non-equi self-join. Calendar days with no orders still
# receive decayed contributions (gap-robust); trailing days past the
# last observed day are cut by a single-row MAX broadcast (the q15
# pattern).
#
# ORDER-INDEPENDENT ARITHMETIC: a first cut weighted by double
# 0.25*0.75^k hash-mismatched at sf0.01 — one of 2405 rows landed ON
# the 4-dp rounding boundary (…092.67375) because double summation
# order differs between engines. The fix is exact integer arithmetic:
# weight_k = 3^k * 4^(11-k) (so ewma = sum/4^12); cents * weight_k
# stays within int64 for any realistic daily volume (1e9 cents/day *
# 4^11 * 12 days ≈ 5e16 < 2^63), the BIGINT sum is order-free, and the
# single final int->double division + round is deterministic IEEE on
# both engines. No summation-order noise exists at all.

_EWMA_SPAN = 12  # alpha=0.25, decay=0.75; k=11 tail weight ~1%

EWMA_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
mx AS (SELECT MAX(day) AS max_day FROM daily),
contrib AS (
  SELECT daily.day + CAST(t.k AS INTEGER) AS tday,
         daily.cents
           * CAST(POWER(3, t.k) * POWER(4, {_EWMA_SPAN - 1} - t.k) AS BIGINT)
           AS w
  FROM daily, unnest(range(0, {_EWMA_SPAN})) AS t(k)
)
SELECT strftime(c.tday, '%Y-%m-%d') AS day,
       ROUND(CAST(SUM(c.w) AS DOUBLE) / POWER(4.0, {_EWMA_SPAN}), 4)
         AS ewma_cents
FROM contrib c, mx
WHERE c.tday <= mx.max_day
GROUP BY c.tday
"""


@register("ewma_daily_revenue", EWMA_ORACLE)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-day truncated EWMA (alpha=0.25, decay=0.75) of daily order
    revenue: (day, ewma_cents), day formatted yyyy-MM-dd."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    max_day = daily.agg(F.max("day").alias("max_day"))
    span = _EWMA_SPAN
    weight = (
        F.pow(F.lit(3.0), "k") * F.pow(F.lit(4.0), F.lit(span - 1) - F.col("k"))
    ).cast("bigint")
    contrib = daily.select(
        "day",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(span - 1))).alias("k"),
    ).select(
        F.date_add("day", F.col("k")).alias("tday"),
        (F.col("cents") * weight).alias("w"),
    )
    return (
        contrib.crossJoin(F.broadcast(max_day))
        .where(F.col("tday") <= F.col("max_day"))
        .groupBy("tday")
        .agg(
            F.round(
                F.sum("w").cast("double") / F.pow(F.lit(4.0), F.lit(span)), 4
            ).alias("ewma_cents")
        )
        .select(
            F.date_format("tday", "yyyy-MM-dd").alias("day"), "ewma_cents"
        )
    )


# ---------------------------------------------------------------------------
# Out-of-fold target encoding (leakage-safe categorical encoding)
# ---------------------------------------------------------------------------
#
# The standard ML-prep move for high-cardinality categoricals: replace
# the category with a smoothed mean of the target, computed OUT OF
# FOLD so a row never sees its own target (the leakage the naive
# all-data mean encoding suffers). Folds are portable md5 buckets (the
# repo's shared fold/shard primitive); the encoding for (fold f,
# category c) uses every fold EXCEPT f:
#
#   enc(f, c) = (oof_sum(c) + m * oof_global_mean(f)) / (oof_cnt(c) + m)
#
# with smoothing m = 10 toward the out-of-fold global mean.
#
# Scale shape: ONE fact aggregation to the (fold x category) grid
# (bounded: 4 x |priorities| = 20 cells); out-of-fold sums are window
# subtractions over that grid, never a second fact pass. Target stays
# integer cents until the final division, which both engines evaluate
# over identical exact inputs with an identical expression tree.

_TE_FOLDS = 4
_TE_SMOOTH = 10.0


def _te_fold_sql(portable: bool) -> str:
    from tfm_semisup_spark.operators.layout import (
        md5_uniform16_spark_sql,
        md5_uniform16_sql,
    )

    fn = md5_uniform16_sql if portable else md5_uniform16_spark_sql
    cast = "VARCHAR" if portable else "STRING"
    return f"({fn(f'md5(CAST(o_orderkey AS {cast}))')} % {_TE_FOLDS})"


TARGET_ENCODE_ORACLE = f"""
WITH cells AS (
  SELECT {_te_fold_sql(True)} AS fold,
         o_orderpriority,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents,
         COUNT(*) AS n
  FROM orders
  GROUP BY 1, 2
),
grid AS (
  SELECT fold, o_orderpriority, cents, n,
         SUM(cents) OVER (PARTITION BY o_orderpriority) - cents AS oof_sum,
         SUM(n) OVER (PARTITION BY o_orderpriority) - n AS oof_cnt,
         SUM(cents) OVER () - SUM(cents) OVER (PARTITION BY fold) AS g_sum,
         SUM(n) OVER () - SUM(n) OVER (PARTITION BY fold) AS g_cnt
  FROM cells
)
SELECT CAST(fold AS BIGINT) AS fold,
       o_orderpriority,
       CAST(oof_cnt AS BIGINT) AS n_oof,
       ROUND((oof_sum + {_TE_SMOOTH} * (CAST(g_sum AS DOUBLE) / g_cnt))
             / (oof_cnt + {_TE_SMOOTH}), 4) AS encoding
FROM grid
"""


@register("target_encode_priority", TARGET_ENCODE_ORACLE)
def target_encode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold smoothed target encoding of o_orderpriority against
    cents revenue, 4 portable md5 folds: (fold, o_orderpriority,
    n_oof, encoding)."""
    orders = load_table(spark, sf_dir, "orders")
    cells = (
        orders.selectExpr(
            f"{_te_fold_sql(False)} AS fold",
            "o_orderpriority",
            "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c1",
        )
        .groupBy("fold", "o_orderpriority")
        .agg(F.sum("c1").alias("cents"), F.count(F.lit(1)).alias("n"))
    )
    w_cat = Window.partitionBy("o_orderpriority")
    w_fold = Window.partitionBy("fold")
    w_all = Window.partitionBy()
    grid = cells.select(
        "fold",
        "o_orderpriority",
        (F.sum("cents").over(w_cat) - F.col("cents")).alias("oof_sum"),
        (F.sum("n").over(w_cat) - F.col("n")).alias("oof_cnt"),
        (F.sum("cents").over(w_all) - F.sum("cents").over(w_fold)).alias("g_sum"),
        (F.sum("n").over(w_all) - F.sum("n").over(w_fold)).alias("g_cnt"),
    )
    return grid.select(
        F.col("fold").cast("bigint").alias("fold"),
        "o_orderpriority",
        F.col("oof_cnt").cast("bigint").alias("n_oof"),
        F.round(
            (
                F.col("oof_sum")
                + _TE_SMOOTH * (F.col("g_sum").cast("double") / F.col("g_cnt"))
            )
            / (F.col("oof_cnt") + _TE_SMOOTH),
            4,
        ).alias("encoding"),
    )


# ---------------------------------------------------------------------------
# Day-of-week seasonal residuals (seasonality-aware anomaly screen)
# ---------------------------------------------------------------------------
#
# partition_anomaly_days (queries/expectations.py) z-scores daily
# volume against the GLOBAL mean — weekly seasonality inflates its
# false positives. This operator deseasonalizes first: residual =
# daily cents - that weekday's mean, z-scored by the weekday's own
# spread. Two bounded aggregates (days, then 7 weekday rows broadcast
# back onto the day table); anomalies = |z| > 3. Exact integer cents
# into fixed-tree double math, rounded.

DOW_RESIDUAL_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
),
dow_stats AS (
  SELECT dow, AVG(CAST(cents AS DOUBLE)) AS mu,
         stddev_samp(CAST(cents AS DOUBLE)) AS sd
  FROM daily GROUP BY dow
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       d.dow,
       CAST(d.cents AS BIGINT) AS cents,
       ROUND((d.cents - s.mu) / s.sd, 4) AS z_dow
FROM daily d JOIN dow_stats s ON d.dow = s.dow
WHERE ABS((d.cents - s.mu) / s.sd) > 3
"""


@register("dow_seasonal_residuals", DOW_RESIDUAL_ORACLE)
def dow_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware daily anomalies: days whose revenue deviates
    >3 sd from THEIR WEEKDAY's mean: (day, dow, cents, z_dow)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.to_date("o_orderdate").alias("day"),
            # DuckDB dayofweek is 0=Sun..6=Sat; Spark's is 1=Sun..7=Sat
            (F.dayofweek(F.to_date("o_orderdate")) - 1)
            .cast("bigint")
            .alias("dow"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    stats = daily.groupBy(F.col("dow").alias("s_dow")).agg(
        F.avg(F.col("cents").cast("double")).alias("mu"),
        F.stddev_samp(F.col("cents").cast("double")).alias("sd"),
    )
    z = (F.col("cents") - F.col("mu")) / F.col("sd")
    return (
        daily.join(F.broadcast(stats), daily.dow == stats.s_dow)
        .where(F.abs(z) > 3)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dow",
            F.col("cents").cast("bigint").alias("cents"),
            F.round(z, 4).alias("z_dow"),
        )
    )


# ---------------------------------------------------------------------------
# Binned two-sample Kolmogorov–Smirnov distance
# ---------------------------------------------------------------------------
#
# Distribution-shift test between two populations (here: lineitem
# price distributions of returnflag 'R' vs 'N'). The EXACT KS statistic
# needs a global value sort — the unpartitioned-window shape this repo
# bans at fact scale — so the scale form bins values onto a bounded
# equal-width grid first (the same trade as price_histogram_bins) and
# takes the max CDF gap over BIN BOUNDARIES: a lower bound of exact KS
# converging as the grid refines, fully deterministic (integer counts,
# fixed bounds). Windows run over the <=100-row grid only.

_KS_BINS = 100
_KS_A, _KS_B = "R", "N"

KS_ORACLE = f"""
WITH vals AS (
  SELECT l_returnflag AS flag,
         CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem WHERE l_returnflag IN ('{_KS_A}', '{_KS_B}')
),
bounds AS (
  SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM vals
),
binned AS (
  SELECT v.flag,
         LEAST(CAST(FLOOR((v.cents - b.lo) * {_KS_BINS}.0 / (b.hi - b.lo + 1))
                    AS BIGINT), {_KS_BINS - 1}) AS bin
  FROM vals v, bounds b
),
grid AS (
  SELECT bin,
         SUM(CASE WHEN flag = '{_KS_A}' THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN flag = '{_KS_B}' THEN 1 ELSE 0 END) AS nb
  FROM binned GROUP BY bin
),
cdf AS (
  SELECT bin,
         SUM(na) OVER (ORDER BY bin) AS ca,
         SUM(nb) OVER (ORDER BY bin) AS cb,
         SUM(na) OVER () AS ta,
         SUM(nb) OVER () AS tb
  FROM grid
)
SELECT CAST(ta AS BIGINT) AS n_a,
       CAST(tb AS BIGINT) AS n_b,
       ROUND(MAX(ABS(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)), 6)
         AS ks_d
FROM cdf
GROUP BY ta, tb
"""


@register("ks_price_by_returnflag", KS_ORACLE)
def ks_price_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS distance between the 'R' and 'N' price
    distributions: single row (n_a, n_b, ks_d)."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.where(F.col("l_returnflag").isin(_KS_A, _KS_B)).select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    bounds = vals.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    binned = vals.crossJoin(F.broadcast(bounds)).select(
        "flag",
        F.least(
            F.floor(
                (F.col("cents") - F.col("lo"))
                * float(_KS_BINS)
                / (F.col("hi") - F.col("lo") + 1)
            ).cast("bigint"),
            F.lit(_KS_BINS - 1),
        ).alias("bin"),
    )
    grid = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("flag") == _KS_A, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("flag") == _KS_B, 1).otherwise(0)).alias("nb"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cdf = grid.select(
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
        F.sum("na").over(w_all).alias("ta"),
        F.sum("nb").over(w_all).alias("tb"),
    )
    return cdf.groupBy("ta", "tb").agg(
        F.max(
            F.abs(
                F.col("ca").cast("double") / F.col("ta")
                - F.col("cb").cast("double") / F.col("tb")
            )
        ).alias("d")
    ).select(
        F.col("ta").cast("bigint").alias("n_a"),
        F.col("tb").cast("bigint").alias("n_b"),
        F.round("d", 6).alias("ks_d"),
    )

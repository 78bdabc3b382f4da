"""Statistical-insight battery #4: experimentation and time-series
forensics.

Four operators an analytics engine's "insight" tier is expected to
ship (extension surface alongside ``stats2.py``/``stats3.py``):

- ``ab_test_conversion_ztest``: two-proportion pooled z-test on user
  conversion between deterministic md5 A/B buckets — the
  experimentation readout primitive. Bucketing reuses the shared
  ``md5_uniform16`` split (``operators/layout.py``) so assignment is
  bit-identical cross-engine and stable under any partitioning.
- ``acf_daily_revenue``: sample autocorrelation of daily revenue at
  lags 1/7/14/28 — the seasonality/memory diagnostic (lag-7 ≫ lag-1
  says weekly cycle; all ≈ 0 says the daily aggregate is white).
- ``cusum_changepoint_daily``: CUSUM change-point scan per order
  priority — the classic level-shift detector: the day where the
  cumulative deviation from the global mean peaks.
- ``kaplan_meier_conversion``: Kaplan–Meier survival of
  view→purchase conversion latency with administrative right-censoring
  at end-of-data — the time-to-event readout (retention/conversion
  curves) done correctly in the presence of users who never convert.

Spark-first / 100 TB shape:
- every operator is ONE fact-scale aggregate (per-user flags; daily
  cents; per-user first-view/first-purchase) followed by math on a
  bounded grid (2 buckets, 4 lags, |days|, |distinct durations|);
  windows only ever run over those bounded grids;
- the ACF lag pairing is an equi-join on (t + k) after exploding the
  fixed lag list — never a range predicate (the Theil–Sen band
  discipline, ``stats3.py``).

Arithmetic parity:
- counts and integer-cents sums stay exact (DECIMAL(38,0) on the
  Spark side, HUGEINT in DuckDB) until a FIXED scalar expression tree
  assembles the statistic in doubles — int→double conversion and each
  double op are correctly rounded, so both engines evaluate the
  identical tree over identical leaves: bit-equal pre-round. This is
  how the ACF avoids per-term (x−x̄) double sums entirely (expanded
  moments: Σxy, Σx, Σx², marginal sums — all exact integers).
- CUSUM deviations are the all-integer form n·cum_t − t·S (never
  cum_t − t·x̄ in doubles), so the argmax compares exact integers —
  no ULP boundary can flip the change-point.
- KM survival is exp(Σ ln(1 − dᵢ/nᵢ)) with the cumulative sum in day
  order on both engines (identical summation order); ln/exp are libm
  (not correctly rounded), so survival is rounded to 6 dp — the
  ``text_bigram_pmi`` precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.layout import (
    md5_uniform16_spark_sql,
    md5_uniform16_sql,
)
from tfm_semisup_spark.queries import register

# ---------------------------------------------------------------------------
# Two-proportion z-test on md5 A/B buckets
# ---------------------------------------------------------------------------

_AB_MD5 = "md5(CAST(user_id AS STRING))"

AB_ZTEST_ORACLE = f"""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events
  GROUP BY user_id
),
conv AS (
  SELECT user_id,
         {md5_uniform16_sql(_AB_MD5)} % 2 AS variant,
         CASE WHEN fp IS NOT NULL AND fp >= fv
                   AND fp <= fv + INTERVAL 24 HOURS
              THEN 1 ELSE 0 END AS converted
  FROM firsts
  WHERE fv IS NOT NULL
),
agg AS (
  SELECT
    SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
    SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
    SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS c_a,
    SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS c_b
  FROM conv
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(c_a AS BIGINT) AS conv_a, CAST(c_b AS BIGINT) AS conv_b,
       ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
       ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
       ROUND((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
             / SQRT((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
FROM agg
"""


@register("ab_test_conversion_ztest", AB_ZTEST_ORACLE)
def ab_test_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test of 24h view→purchase conversion
    between the deterministic md5 A/B user buckets: one row
    (n_a, n_b, conv_a, conv_b, rate_a, rate_b, z_score). The synthetic
    events give EVERY user a purchase eventually, so "converted" is
    the 24-hours-after-first-view form — a non-degenerate rate (a
    pooled rate of exactly 0/1 makes z undefined; ANSI Spark throws
    where DuckDB emits inf)."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "fp"
        ),
    )
    conv = (
        firsts.where(F.col("fv").isNotNull())
        .select(
            "user_id",
            F.when(
                F.col("fp").isNotNull()
                & (F.col("fp") >= F.col("fv"))
                & (F.col("fp") <= F.col("fv") + F.expr("INTERVAL 24 HOURS")),
                1,
            )
            .otherwise(0)
            .alias("converted"),
        )
        .withColumn("variant", F.expr(md5_uniform16_spark_sql(_AB_MD5)) % 2)
    )
    agg = conv.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)).alias(
            "c_a"
        ),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)).alias(
            "c_b"
        ),
    )
    ra = F.col("c_a").cast("double") / F.col("n_a")
    rb = F.col("c_b").cast("double") / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (ra - rb) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("c_a").cast("bigint").alias("conv_a"),
        F.col("c_b").cast("bigint").alias("conv_b"),
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Daily-revenue autocorrelation at fixed lags
# ---------------------------------------------------------------------------
#
# r_k over the OBSERVED day grid (gap days simply contribute no pair):
#   r_k = [Σ x_t·x_{t+k} − x̄(Σ_head + Σ_tail) + n_k·x̄²] / (Σx² − S²/n)
# with x̄ = S/n over all n observed days. Every Σ is an exact integer;
# the division tree is fixed.

_ACF_LAGS = (1, 7, 14, 28)

ACF_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
tot AS (
  SELECT COUNT(*)::BIGINT AS n,
         SUM(CAST(cents AS HUGEINT)) AS s,
         SUM(CAST(cents AS HUGEINT) * cents) AS sxx
  FROM daily
),
lagged AS (
  SELECT l.lag AS lag,
         COUNT(*)::BIGINT AS n_pairs,
         SUM(CAST(a.cents AS HUGEINT) * b.cents) AS sxy,
         SUM(CAST(a.cents AS HUGEINT)) AS s_head,
         SUM(CAST(b.cents AS HUGEINT)) AS s_tail
  FROM daily a
  JOIN (VALUES {", ".join(f"({k})" for k in _ACF_LAGS)}) AS l(lag) ON TRUE
  JOIN daily b ON b.day = a.day + CAST(l.lag AS INT)
  GROUP BY l.lag
)
SELECT CAST(g.lag AS BIGINT) AS lag, g.n_pairs,
       ROUND((CAST(g.sxy AS DOUBLE)
              - (CAST(t.s AS DOUBLE) / t.n)
                * (CAST(g.s_head AS DOUBLE) + CAST(g.s_tail AS DOUBLE))
              + g.n_pairs * (CAST(t.s AS DOUBLE) / t.n)
                          * (CAST(t.s AS DOUBLE) / t.n))
             / (CAST(t.sxx AS DOUBLE)
                - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n),
             6) AS acf
FROM lagged g CROSS JOIN tot t
"""


@register("acf_daily_revenue", ACF_ORACLE)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of daily revenue at lags {lags}:
    (lag, n_pairs, acf) — expanded-moment form, exact integer
    sums.""".format(lags=_ACF_LAGS)
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.to_date("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c100"),
        )
        .groupBy("day")
        .agg(F.sum("c100").cast("bigint").alias("cents"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec("cents")).alias("s"),
        F.sum(dec("cents") * F.col("cents")).alias("sxx"),
    )
    lags = spark.createDataFrame([(k,) for k in _ACF_LAGS], "lag int")
    left = daily.crossJoin(F.broadcast(lags)).withColumn(
        "day2", F.date_add("day", F.col("lag"))
    )
    right = daily.select(
        F.col("day").alias("rday"), F.col("cents").alias("rcents")
    )
    lagged = (
        left.join(right, F.col("day2") == F.col("rday"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(dec("cents") * F.col("rcents")).alias("sxy"),
            F.sum(dec("cents")).alias("s_head"),
            F.sum(dec("rcents")).alias("s_tail"),
        )
    )
    xbar = F.col("s").cast("double") / F.col("n")
    num = (
        F.col("sxy").cast("double")
        - xbar * (F.col("s_head").cast("double") + F.col("s_tail").cast("double"))
        + F.col("n_pairs") * xbar * xbar
    )
    den = F.col("sxx").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ).cast("double") / F.col("n")
    return (
        lagged.crossJoin(F.broadcast(tot))
        .select(
            F.col("lag").cast("bigint").alias("lag"),
            "n_pairs",
            F.round(num / den, 6).alias("acf"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point per order priority
# ---------------------------------------------------------------------------

CUSUM_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
cum AS (
  SELECT priority, day,
         SUM(CAST(cents AS HUGEINT))
           OVER (PARTITION BY priority ORDER BY day) AS cum_cents,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY day) AS t,
         SUM(CAST(cents AS HUGEINT)) OVER (PARTITION BY priority) AS s,
         COUNT(*) OVER (PARTITION BY priority) AS n
  FROM daily
),
dev AS (
  SELECT priority, day, n,
         n * cum_cents - t * s AS ndev,
         ROW_NUMBER() OVER (
           PARTITION BY priority
           ORDER BY ABS(n * cum_cents - t * s) DESC, day
         ) AS rk
  FROM cum
)
SELECT priority,
       CAST(n AS BIGINT) AS n_days,
       CAST(day AS VARCHAR) AS change_day,
       ROUND(CAST(ndev AS DOUBLE) / n, 4) AS cusum_cents
FROM dev WHERE rk = 1
"""


@register("cusum_changepoint_daily", CUSUM_ORACLE)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift scan of daily revenue per priority:
    (priority, n_days, change_day, cusum_cents) — the day maximizing
    |Σ_{i≤t}(xᵢ − x̄)|, argmax on the exact integer form n·cum − t·S."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c100"),
        )
        .groupBy("priority", "day")
        .agg(F.sum("c100").cast("bigint").alias("cents"))
    )
    wday = Window.partitionBy("priority").orderBy("day")
    wall = Window.partitionBy("priority")
    dec = F.col("cents").cast("decimal(38,0)")
    cum = daily.select(
        "priority",
        "day",
        F.sum(dec).over(wday).alias("cum_cents"),
        F.row_number().over(wday).alias("t"),
        F.sum(dec).over(wall).alias("s"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    ndev = F.col("n") * F.col("cum_cents") - F.col("t") * F.col("s")
    ranked = cum.withColumn("ndev", ndev).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("priority").orderBy(
                F.abs(F.col("ndev")).desc(), "day"
            )
        ),
    )
    return ranked.where(F.col("rk") == 1).select(
        "priority",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("day").cast("string").alias("change_day"),
        F.round(F.col("ndev").cast("double") / F.col("n"), 4).alias(
            "cusum_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier view→purchase conversion survival
# ---------------------------------------------------------------------------

KM_ORACLE = """
WITH bounds AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
  FROM events
  GROUP BY user_id
),
durs AS (
  SELECT CASE
           WHEN f.first_buy IS NOT NULL AND f.first_buy >= f.first_view
             THEN date_diff('day', CAST(f.first_view AS DATE),
                            CAST(f.first_buy AS DATE))
           ELSE date_diff('day', CAST(f.first_view AS DATE), b.max_day)
         END AS dur,
         CASE WHEN f.first_buy IS NOT NULL AND f.first_buy >= f.first_view
              THEN 1 ELSE 0 END AS event
  FROM firsts f CROSS JOIN bounds b
  WHERE f.first_view IS NOT NULL
),
grid AS (
  SELECT dur, COUNT(*)::BIGINT AS n_at,
         SUM(event)::BIGINT AS d_at
  FROM durs GROUP BY dur
),
risk AS (
  SELECT dur, d_at,
         SUM(n_at) OVER (ORDER BY dur DESC) AS n_risk
  FROM grid
),
km AS (
  SELECT dur, d_at, n_risk,
         SUM(ln(1.0 - CAST(d_at AS DOUBLE) / n_risk))
           OVER (ORDER BY dur) AS log_s
  FROM risk
  WHERE d_at > 0
)
SELECT CAST(dur AS BIGINT) AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       d_at AS n_events,
       ROUND(EXP(log_s), 6) AS survival
FROM km
"""


@register("kaplan_meier_conversion", KM_ORACLE)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival of view→purchase latency, right-censored
    at end-of-data: (t_days, n_risk, n_events, survival) at each
    conversion day; S = Π(1 − dᵢ/nᵢ) via exp(Σ ln) in day order."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(F.max(F.to_date("ts")).alias("max_day"))
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_buy"
        ),
    )
    is_event = F.col("first_buy").isNotNull() & (
        F.col("first_buy") >= F.col("first_view")
    )
    durs = (
        firsts.where(F.col("first_view").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(
                is_event,
                F.datediff(F.to_date("first_buy"), F.to_date("first_view")),
            )
            .otherwise(F.datediff(F.col("max_day"), F.to_date("first_view")))
            .alias("dur"),
            F.when(is_event, 1).otherwise(0).alias("event"),
        )
    )
    grid = durs.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_at"),
        F.sum("event").cast("bigint").alias("d_at"),
    )
    risk = grid.select(
        "dur",
        "d_at",
        F.sum("n_at")
        .over(Window.orderBy(F.col("dur").desc()))
        .alias("n_risk"),
    )
    km = risk.where(F.col("d_at") > 0).withColumn(
        "log_s",
        F.sum(
            F.log(F.lit(1.0) - F.col("d_at").cast("double") / F.col("n_risk"))
        ).over(Window.orderBy("dur")),
    )
    return km.select(
        F.col("dur").cast("bigint").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d_at").alias("n_events"),
        F.round(F.exp("log_s"), 6).alias("survival"),
    )


# ---------------------------------------------------------------------------
# Deterministic half-sample replicates (resampling-based uncertainty)
# ---------------------------------------------------------------------------
#
# The resampling leg of the statistics surface: B half-sample
# replicates of mean order value — the subsampling estimator of the
# mean's sampling distribution (delete-d jackknife / m-out-of-n
# bootstrap family; Politis-Romano subsampling). A CI is two
# percentiles of these B means; the oracle-checked artifact is the
# replicate set itself, which pins the whole resampling machinery
# without committing to one interpolation convention.
#
# Replicate membership is md5(order '#' b) < 2^15 — the deterministic
# md5-threshold discipline (corpus_prep samplers): no RNG, identical
# membership cross-engine and under any partitioning. The explode is
# a fixed ×B fan-out straight into a hash aggregate (map-side combine
# reduces to B rows per task), so the shuffle moves B×partitions rows,
# never B×orders.

_HS_REPS = 32

HALF_SAMPLE_ORACLE = f"""
WITH reps AS (
  SELECT o.o_orderkey,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents,
         u.b
  FROM orders o, UNNEST(generate_series(0, {_HS_REPS - 1})) AS u(b)
),
kept AS (
  SELECT b, cents FROM reps
  WHERE {md5_uniform16_sql("md5(CAST(o_orderkey AS STRING) || '#' || CAST(b AS STRING))")}
        < 32768
)
SELECT CAST(b AS BIGINT) AS replicate,
       COUNT(*)::BIGINT AS n_kept,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / COUNT(*), 4)
         AS mean_cents
FROM kept
GROUP BY b
"""


@register("half_sample_replicate_means", HALF_SAMPLE_ORACLE)
def half_sample_replicate_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{b} deterministic md5 half-sample replicates of mean order value:
    (replicate, n_kept, mean_cents) — the subsampling estimate of the
    mean's sampling distribution.""".format(b=_HS_REPS)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    reps = orders.withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(_HS_REPS - 1)))
    )
    keep_hash = md5_uniform16_spark_sql(
        "md5(CAST(o_orderkey AS STRING) || '#' || CAST(b AS STRING))"
    )
    return (
        reps.where(F.expr(keep_hash) < 32768)
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.round(
                F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mean_cents"),
        )
        .select(F.col("b").cast("bigint").alias("replicate"), "n_kept", "mean_cents")
    )


# ---------------------------------------------------------------------------
# Population Stability Index (PSI) — the ML-monitoring drift metric
# ---------------------------------------------------------------------------
#
# PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) between a baseline and a
# comparison window — the score/feature-drift gate every deployed-model
# monitor computes (alongside the distribution tests already here:
# binned KS, JSD source drift). Baseline = orders before 1998-01-01,
# comparison = after (the synthetic orders START at 1995-01-01, so the
# original pre-1995 baseline was EMPTY and the whole result vacuous —
# r13 vacuity audit); the binning grid is FIXED from the baseline's
# per-segment max price (20 equal-width bins + LEAST clamp for
# comparison overflow), which is the production shape — the baseline
# grid is frozen, new data is clamped into it. Laplace-smoothed counts
# ((c+1)/(n+bins)) keep empty bins finite — and smoothing is exact
# integer arithmetic until one division. Windows only over the
# bounded segment×bin grid; the two period scans are one aggregate
# each. ln is libm → round 6 (the PMI precedent).

_PSI_BINS = 20

PSI_ORACLE = f"""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
),
comp AS (
  SELECT c.c_mktsegment AS segment,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE CAST(o.o_orderdate AS DATE) >= DATE '1998-01-01'
),
mx AS (SELECT segment, MAX(cents) AS mx FROM base GROUP BY segment),
bb AS (
  SELECT b.segment,
         LEAST({_PSI_BINS - 1},
               CAST(FLOOR(CAST(b.cents AS DOUBLE) * {_PSI_BINS} / m.mx)
                    AS INT)) AS bin,
         COUNT(*)::BIGINT AS nb
  FROM base b JOIN mx m ON b.segment = m.segment GROUP BY 1, 2
),
cb AS (
  SELECT c.segment,
         LEAST({_PSI_BINS - 1},
               CAST(FLOOR(CAST(c.cents AS DOUBLE) * {_PSI_BINS} / m.mx)
                    AS INT)) AS bin,
         COUNT(*)::BIGINT AS nc
  FROM comp c JOIN mx m ON c.segment = m.segment GROUP BY 1, 2
),
grid AS (
  SELECT s.segment, g.bin FROM (SELECT DISTINCT segment FROM mx) s,
       UNNEST(generate_series(0, {_PSI_BINS - 1})) AS g(bin)
),
joined AS (
  SELECT g.segment, g.bin,
         COALESCE(b.nb, 0) AS nb, COALESCE(c.nc, 0) AS nc
  FROM grid g
  LEFT JOIN bb b ON g.segment = b.segment AND g.bin = b.bin
  LEFT JOIN cb c ON g.segment = c.segment AND g.bin = c.bin
),
tot AS (
  SELECT segment, SUM(nb) AS tb, SUM(nc) AS tc FROM joined GROUP BY segment
)
SELECT j.segment,
       CAST(t.tb AS BIGINT) AS n_base,
       CAST(t.tc AS BIGINT) AS n_comp,
       ROUND(SUM(
         (CAST(j.nb + 1 AS DOUBLE) / (t.tb + {_PSI_BINS})
          - CAST(j.nc + 1 AS DOUBLE) / (t.tc + {_PSI_BINS}))
         * ln((CAST(j.nb + 1 AS DOUBLE) / (t.tb + {_PSI_BINS}))
              / (CAST(j.nc + 1 AS DOUBLE) / (t.tc + {_PSI_BINS})))
       ), 6) AS psi
FROM joined j JOIN tot t ON j.segment = t.segment
GROUP BY j.segment, t.tb, t.tc
"""


@register("psi_price_by_segment", PSI_ORACLE)
def psi_price_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of order price per segment between
    the pre/post-1998 periods: (segment, n_base, n_comp, psi) — frozen
    baseline bin grid, Laplace-smoothed shares."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    priced = orders.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).join(customer, F.col("o_custkey") == customer.c_custkey)
    base = priced.where(F.col("day") < F.lit("1998-01-01"))
    comp = priced.where(F.col("day") >= F.lit("1998-01-01"))
    mx = base.groupBy("segment").agg(F.max("cents").alias("mx"))

    def binned(df: DataFrame, out: str) -> DataFrame:
        return (
            df.join(F.broadcast(mx), "segment")
            .withColumn(
                "bin",
                F.least(
                    F.lit(_PSI_BINS - 1),
                    F.floor(
                        F.col("cents").cast("double") * _PSI_BINS / F.col("mx")
                    ).cast("int"),
                ),
            )
            .groupBy("segment", "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    grid = mx.select("segment").crossJoin(
        spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    )
    joined = (
        grid.join(binned(base, "nb"), ["segment", "bin"], "left")
        .join(binned(comp, "nc"), ["segment", "bin"], "left")
        .fillna(0, ["nb", "nc"])
    )
    w = Window.partitionBy("segment")
    shares = joined.select(
        "segment",
        "nb",
        "nc",
        F.sum("nb").over(w).alias("tb"),
        F.sum("nc").over(w).alias("tc"),
    )
    p = (F.col("nb") + 1).cast("double") / (F.col("tb") + _PSI_BINS)
    q = (F.col("nc") + 1).cast("double") / (F.col("tc") + _PSI_BINS)
    return shares.groupBy("segment").agg(
        F.max("tb").cast("bigint").alias("n_base"),
        F.max("tc").cast("bigint").alias("n_comp"),
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
    )


# ---------------------------------------------------------------------------
# Nelson–Aalen cumulative hazard of view→purchase conversion (r10)
# ---------------------------------------------------------------------------
#
# The hazard-side companion to kaplan_meier_conversion (Nelson 1972,
# Aalen 1978): on the SAME duration grid and risk sets,
#   H(t)  = Σ_{t_i ≤ t} d_i / n_i          (cumulative hazard)
#   σ²(t) = Σ_{t_i ≤ t} d_i / n_i²         (Aalen's variance)
#   S̃(t)  = exp(−H(t))                     (Fleming–Harrington)
# Double trees are per-event-time rationals from exact integer
# (d_i, n_i), accumulated by a window ORDERED BY the bounded day grid —
# the same sequential-frame determinism argument as the KM log-sum, so
# both engines add in the identical order. The risk-set window runs
# over the duration GRID (calendar-bounded), never the user table.

NELSON_AALEN_ORACLE = """
WITH bounds AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
  FROM events
  GROUP BY user_id
),
durs AS (
  SELECT CASE
           WHEN f.first_buy IS NOT NULL AND f.first_buy >= f.first_view
             THEN date_diff('day', CAST(f.first_view AS DATE),
                            CAST(f.first_buy AS DATE))
           ELSE date_diff('day', CAST(f.first_view AS DATE), b.max_day)
         END AS dur,
         CASE WHEN f.first_buy IS NOT NULL AND f.first_buy >= f.first_view
              THEN 1 ELSE 0 END AS event
  FROM firsts f CROSS JOIN bounds b
  WHERE f.first_view IS NOT NULL
),
grid AS (
  SELECT dur, COUNT(*)::BIGINT AS n_at,
         SUM(event)::BIGINT AS d_at
  FROM durs GROUP BY dur
),
risk AS (
  SELECT dur, d_at,
         SUM(n_at) OVER (ORDER BY dur DESC) AS n_risk
  FROM grid
),
na AS (
  SELECT dur, d_at, n_risk,
         SUM(CAST(d_at AS DOUBLE) / n_risk)
           OVER (ORDER BY dur) AS h,
         SUM(CAST(d_at AS DOUBLE) / (CAST(n_risk AS DOUBLE) * n_risk))
           OVER (ORDER BY dur) AS var_h
  FROM risk
  WHERE d_at > 0
)
SELECT CAST(dur AS BIGINT) AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       d_at AS n_events,
       ROUND(h, 6) AS cum_hazard,
       ROUND(var_h, 6) AS var_hazard,
       ROUND(EXP(-h), 6) AS fh_survival
FROM na
"""


@register("nelson_aalen_conversion", NELSON_AALEN_ORACLE)
def nelson_aalen_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard of view→purchase latency on the
    Kaplan–Meier risk grid: (t_days, n_risk, n_events, cum_hazard,
    var_hazard, fh_survival)."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(F.max(F.to_date("ts")).alias("max_day"))
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_buy"
        ),
    )
    is_event = F.col("first_buy").isNotNull() & (
        F.col("first_buy") >= F.col("first_view")
    )
    durs = (
        firsts.where(F.col("first_view").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(
                is_event,
                F.datediff(F.to_date("first_buy"), F.to_date("first_view")),
            )
            .otherwise(F.datediff(F.col("max_day"), F.to_date("first_view")))
            .alias("dur"),
            F.when(is_event, 1).otherwise(0).alias("event"),
        )
    )
    grid = durs.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_at"),
        F.sum("event").cast("bigint").alias("d_at"),
    )
    risk = grid.select(
        "dur",
        "d_at",
        F.sum("n_at")
        .over(Window.orderBy(F.col("dur").desc()))
        .alias("n_risk"),
    )
    wt = Window.orderBy("dur")
    na = (
        risk.where(F.col("d_at") > 0)
        .withColumn(
            "h",
            F.sum(F.col("d_at").cast("double") / F.col("n_risk")).over(wt),
        )
        .withColumn(
            "var_h",
            F.sum(
                F.col("d_at").cast("double")
                / (F.col("n_risk").cast("double") * F.col("n_risk"))
            ).over(wt),
        )
    )
    return na.select(
        F.col("dur").cast("bigint").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d_at").alias("n_events"),
        F.round("h", 6).alias("cum_hazard"),
        F.round("var_h", 6).alias("var_hazard"),
        F.round(F.exp(-F.col("h")), 6).alias("fh_survival"),
    )

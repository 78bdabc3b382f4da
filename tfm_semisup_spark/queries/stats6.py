"""Statistical-insight battery #6: survival comparison, k-group ranks,
and causal-inference panels.

Three families that round out the inference tier (extension surface
alongside ``stats2``–``stats5``; no reference analog —
Dguipla/TFM-SemiSup's statistics end at accuracy/AUC means, so these
follow the published formulas cited per query):

- ``logrank_conversion_ab``: Mantel-Cox log-rank test comparing the
  view→purchase survival curves of the deterministic md5 A/B user
  buckets (Mantel 1966; the hypothesis-test companion to
  ``kaplan_meier_conversion``'s estimator).
- ``kruskal_wallis_qty_flag``: tie-corrected Kruskal-Wallis H across
  the three return-flag groups — the k-group extension of
  ``mannwhitney_qty_flag`` (Kruskal & Wallis 1952).
- ``did_order_value``: 2×2 difference-in-differences panel on order
  value (md5 treat/control × fixed pre/post date cutoff) with the
  unpooled-variance standard error (Card & Krueger 1994 shape).

Spark-first / 100 TB shape (the stats5 contract):
- every fact-scale pass is ONE groupBy shuffle down to a bounded grid
  (distinct conversion-day durations are calendar-bounded; the
  quantity grid has ≤ ~50 values; the DiD panel is 4 cells); all
  windows/joins run on the grid.
- arithmetic parity: exact integer sums (Spark DECIMAL(38,0), DuckDB
  HUGEINT) end-to-end; per-row rational terms are quantized with an
  EXACT integer floor division (pmod-subtract on Spark, ``//`` on
  DuckDB) and summed as integers, so no summation-order ULP exists
  anywhere; a FIXED scalar double tree assembles each statistic at
  the end (int→double and each double op correctly rounded ⇒
  bit-equal cross-engine pre-round).
- quantized-term headroom: the log-rank variance numerator is
  d·n₁·(n−n₁)·(n−d)·10⁶ — exact within DECIMAL(38,0)/HUGEINT up to
  ~10⁸ at-risk users per day grid row; past that, drop the
  quantization scale (the chi2_status_priority bound class,
  documented in SCALE.md).
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

_DEC = "decimal(38,0)"

_AB_MD5 = "md5(CAST(user_id AS STRING))"

# ---------------------------------------------------------------------------
# Mantel-Cox log-rank test on md5 A/B buckets
# ---------------------------------------------------------------------------
#
# Same survival construction as kaplan_meier_conversion (first view →
# first purchase latency in days, right-censored at end-of-data), with
# the population split by the deterministic md5 A/B bucket of
# ab_test_conversion_ztest. At each distinct duration t with d_t > 0
# events and n_t > 1 at risk:
#
#   E1 += d_t · n1_t / n_t
#   V  += d_t · n1_t · (n_t − n1_t) · (n_t − d_t) / (n_t² · (n_t − 1))
#   Z   = (O1 − E1) / sqrt(V)
#
# Both rational terms are quantized to exact integers (scales below)
# and summed as integers; at-risk counts come from a reverse cumsum
# over the calendar-bounded duration grid.

_LR_E_SCALE = 1_000_000_000  # 10^9 on the expectation terms
_LR_V_SCALE = 1_000_000  # 10^6 on the variance terms (headroom note above)

LOGRANK_ORACLE = f"""
WITH bounds AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events
  GROUP BY user_id
),
durs AS (
  SELECT {md5_uniform16_sql(_AB_MD5)} % 2 AS variant,
         CASE WHEN f.fp IS NOT NULL AND f.fp >= f.fv
              THEN date_diff('day', CAST(f.fv AS DATE), CAST(f.fp AS DATE))
              ELSE date_diff('day', CAST(f.fv AS DATE), b.max_day)
         END AS dur,
         CASE WHEN f.fp IS NOT NULL AND f.fp >= f.fv THEN 1 ELSE 0 END
           AS event
  FROM firsts f CROSS JOIN bounds b
  WHERE f.fv IS NOT NULL
),
grid AS (
  SELECT dur,
         COUNT(*)::HUGEINT AS n_at,
         SUM(event)::HUGEINT AS d_at,
         SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::HUGEINT AS n1_at,
         SUM(CASE WHEN variant = 0 THEN event ELSE 0 END)::HUGEINT AS d1_at
  FROM durs GROUP BY dur
),
risk AS (
  SELECT dur, d_at, d1_at,
         SUM(n_at) OVER (ORDER BY dur DESC) AS n_risk,
         SUM(n1_at) OVER (ORDER BY dur DESC) AS n1_risk
  FROM grid
),
terms AS (
  SELECT d1_at,
         (d_at * n1_risk * {_LR_E_SCALE}) // n_risk AS e_q,
         (d_at * n1_risk * (n_risk - n1_risk) * (n_risk - d_at)
            * {_LR_V_SCALE})
           // (n_risk * n_risk * (n_risk - 1)) AS v_q
  FROM risk
  WHERE d_at > 0 AND n_risk > 1
),
pops AS (
  SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::HUGEINT AS n_a,
         SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::HUGEINT AS n_b
  FROM durs
)
SELECT p.n_a::BIGINT AS n_a,
       p.n_b::BIGINT AS n_b,
       SUM(t.d1_at)::BIGINT AS events_a,
       ROUND(CAST(SUM(t.e_q) AS DOUBLE)
             / CAST({_LR_E_SCALE} AS DOUBLE), 4) AS expected_a,
       ROUND((CAST(SUM(t.d1_at) AS DOUBLE)
              - CAST(SUM(t.e_q) AS DOUBLE) / CAST({_LR_E_SCALE} AS DOUBLE))
             / SQRT(CAST(SUM(t.v_q) AS DOUBLE)
                    / CAST({_LR_V_SCALE} AS DOUBLE)), 6) AS logrank_z
FROM terms t CROSS JOIN pops p
GROUP BY p.n_a, p.n_b
"""


@register("logrank_conversion_ab", LOGRANK_ORACLE)
def logrank_conversion_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test of view→purchase survival between the md5 A/B
    user buckets: one row (n_a, n_b, events_a, expected_a, logrank_z).
    O−E and V accumulate as quantized exact integers over the
    calendar-bounded duration grid."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(F.max(F.to_date("ts")).alias("max_day"))
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "fp"
        ),
    )
    is_event = F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))
    durs = (
        firsts.where(F.col("fv").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            (F.expr(md5_uniform16_spark_sql(_AB_MD5)) % 2).alias("variant"),
            F.when(
                is_event, F.datediff(F.to_date("fp"), F.to_date("fv"))
            )
            .otherwise(F.datediff(F.col("max_day"), F.to_date("fv")))
            .alias("dur"),
            F.when(is_event, 1).otherwise(0).alias("event"),
        )
    )
    grid = durs.groupBy("dur").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n_at"),
        F.sum("event").cast(_DEC).alias("d_at"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast(_DEC)
        .alias("n1_at"),
        F.sum(F.when(F.col("variant") == 0, F.col("event")).otherwise(0))
        .cast(_DEC)
        .alias("d1_at"),
    )
    wrev = Window.orderBy(F.col("dur").desc())
    risk = grid.select(
        "dur",
        "d_at",
        "d1_at",
        F.sum("n_at").over(wrev).alias("n_risk"),
        F.sum("n1_at").over(wrev).alias("n1_risk"),
    )

    def _floordiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast(_DEC)

    e_num = (F.col("d_at") * F.col("n1_risk") * F.lit(_LR_E_SCALE)).cast(_DEC)
    v_num = (
        F.col("d_at")
        * F.col("n1_risk")
        * (F.col("n_risk") - F.col("n1_risk"))
        * (F.col("n_risk") - F.col("d_at"))
        * F.lit(_LR_V_SCALE)
    ).cast(_DEC)
    v_den = (
        F.col("n_risk") * F.col("n_risk") * (F.col("n_risk") - 1)
    ).cast(_DEC)
    terms = risk.where((F.col("d_at") > 0) & (F.col("n_risk") > 1)).select(
        "d1_at",
        _floordiv(e_num, F.col("n_risk").cast(_DEC)).alias("e_q"),
        _floordiv(v_num, v_den).alias("v_q"),
    )
    pops = durs.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast(_DEC)
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast(_DEC)
        .alias("n_b"),
    )
    o1 = F.sum("d1_at").cast("double")
    e1 = F.sum("e_q").cast("double") / F.lit(float(_LR_E_SCALE))
    v = F.sum("v_q").cast("double") / F.lit(float(_LR_V_SCALE))
    return (
        terms.crossJoin(F.broadcast(pops))
        .groupBy("n_a", "n_b")
        .agg(
            F.sum("d1_at").cast("bigint").alias("events_a"),
            F.round(e1, 4).alias("expected_a"),
            F.round((o1 - e1) / F.sqrt(v), 6).alias("logrank_z"),
        )
        .select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            "events_a",
            "expected_a",
            "logrank_z",
        )
    )


# ---------------------------------------------------------------------------
# Restricted mean survival time (RMST) per A/B bucket
# ---------------------------------------------------------------------------
#
# The estimand regulators ask for when proportional hazards is
# doubtful (Royston & Parmar 2013): RMST(τ) = ∫₀^τ S(t) dt, the area
# under the Kaplan-Meier step curve up to a fixed horizon. Computed
# per md5 A/B bucket on the same duration grid as the log-rank test:
# S(t) via the KM exp(Σ ln) convention (cumsum in day order on both
# engines, each step rounded to 6 dp), then the step-area sum is an
# ORDERED window cumsum over the calendar-bounded step grid — the
# same fixed evaluation sequence on both engines — plus the initial
# S=1 segment [0, first_event_day).

_RMST_TAU = 30  # days

RMST_ORACLE = f"""
WITH bounds AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events
  GROUP BY user_id
),
durs AS (
  SELECT {md5_uniform16_sql(_AB_MD5)} % 2 AS variant,
         CASE WHEN f.fp IS NOT NULL AND f.fp >= f.fv
              THEN date_diff('day', CAST(f.fv AS DATE), CAST(f.fp AS DATE))
              ELSE date_diff('day', CAST(f.fv AS DATE), b.max_day)
         END AS dur,
         CASE WHEN f.fp IS NOT NULL AND f.fp >= f.fv THEN 1 ELSE 0 END
           AS event
  FROM firsts f CROSS JOIN bounds b
  WHERE f.fv IS NOT NULL
),
grid AS (
  SELECT variant, dur,
         COUNT(*)::HUGEINT AS n_at, SUM(event)::HUGEINT AS d_at
  FROM durs GROUP BY variant, dur
),
risk AS (
  SELECT variant, dur, d_at,
         SUM(n_at) OVER (PARTITION BY variant ORDER BY dur DESC) AS n_risk
  FROM grid
),
km AS (
  SELECT variant, dur,
         ROUND(EXP(SUM(LN(1.0 - CAST(d_at AS DOUBLE) / n_risk))
                   OVER (PARTITION BY variant ORDER BY dur)), 6) AS s
  FROM risk WHERE d_at > 0
),
steps AS (
  SELECT variant, dur, s,
         LEAD(dur) OVER (PARTITION BY variant ORDER BY dur) AS next_dur
  FROM km
),
areas AS (
  SELECT variant, dur,
         s * (LEAST(COALESCE(next_dur, {_RMST_TAU}), {_RMST_TAU}) - dur)
           AS seg,
         MIN(dur) OVER (PARTITION BY variant) AS first_dur
  FROM steps
  WHERE dur <= {_RMST_TAU}
),
-- ordered accumulation (the KM cumsum discipline): cumsum in dur
-- order, take the last row — ONE evaluation order on both engines
cum AS (
  SELECT variant, first_dur,
         SUM(seg) OVER (PARTITION BY variant ORDER BY dur) AS cum_seg,
         ROW_NUMBER() OVER (PARTITION BY variant ORDER BY dur DESC) AS rk
  FROM areas
),
rmst AS (
  SELECT variant,
         LEAST(first_dur, {_RMST_TAU}) + cum_seg AS rmst_days
  FROM cum WHERE rk = 1
),
pops AS (
  SELECT variant, COUNT(*)::BIGINT AS n_users,
         SUM(CASE WHEN event = 1 AND dur <= {_RMST_TAU} THEN 1 ELSE 0 END)
           ::BIGINT AS events_within_tau
  FROM durs GROUP BY variant
)
SELECT p.variant::BIGINT AS variant, p.n_users, p.events_within_tau,
       ROUND(r.rmst_days, 4) AS rmst_days
FROM pops p JOIN rmst r ON p.variant = r.variant
"""


@register("rmst_conversion_ab", RMST_ORACLE)
def rmst_conversion_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time at τ={_RMST_TAU} days per md5 A/B
    bucket: (variant, n_users, events_within_tau, rmst_days)."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(F.max(F.to_date("ts")).alias("max_day"))
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "fp"
        ),
    )
    is_event = F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))
    durs = (
        firsts.where(F.col("fv").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            (F.expr(md5_uniform16_spark_sql(_AB_MD5)) % 2).alias("variant"),
            F.when(
                is_event, F.datediff(F.to_date("fp"), F.to_date("fv"))
            )
            .otherwise(F.datediff(F.col("max_day"), F.to_date("fv")))
            .alias("dur"),
            F.when(is_event, 1).otherwise(0).alias("event"),
        )
    )
    grid = durs.groupBy("variant", "dur").agg(
        F.count(F.lit(1)).alias("n_at"), F.sum("event").alias("d_at")
    )
    wv = Window.partitionBy("variant")
    risk = grid.select(
        "variant",
        "dur",
        "d_at",
        F.sum("n_at").over(wv.orderBy(F.col("dur").desc())).alias("n_risk"),
    )
    km = risk.where(F.col("d_at") > 0).select(
        "variant",
        "dur",
        F.round(
            F.exp(
                F.sum(
                    F.log(
                        F.lit(1.0)
                        - F.col("d_at").cast("double") / F.col("n_risk")
                    )
                ).over(wv.orderBy("dur"))
            ),
            6,
        ).alias("s"),
    )
    steps = km.withColumn(
        "next_dur", F.lead("dur").over(wv.orderBy("dur"))
    )
    areas = steps.where(F.col("dur") <= _RMST_TAU).select(
        "variant",
        "dur",
        (
            F.col("s")
            * (
                F.least(
                    F.coalesce(F.col("next_dur"), F.lit(_RMST_TAU)),
                    F.lit(_RMST_TAU),
                )
                - F.col("dur")
            )
        ).alias("seg"),
        F.min("dur")
        .over(wv.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("first_dur"),
    )
    # ordered accumulation (the KM cumsum discipline): take the last
    # cumulative row per variant so the scalar sum has ONE evaluation
    # order on both engines
    cum = areas.select(
        "variant",
        "first_dur",
        F.sum("seg").over(wv.orderBy("dur")).alias("cum_seg"),
        F.row_number()
        .over(wv.orderBy(F.col("dur").desc()))
        .alias("rk_d"),
    ).where(F.col("rk_d") == 1)
    rmst = cum.select(
        "variant",
        (
            F.least(F.col("first_dur"), F.lit(_RMST_TAU)) + F.col("cum_seg")
        ).alias("rmst_days"),
    )
    pops = durs.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(
            F.when((F.col("event") == 1) & (F.col("dur") <= _RMST_TAU), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("events_within_tau"),
    )
    return pops.join(rmst, "variant").select(
        F.col("variant").cast("bigint").alias("variant"),
        "n_users",
        "events_within_tau",
        F.round("rmst_days", 4).alias("rmst_days"),
    )


# ---------------------------------------------------------------------------
# Tie-corrected Kruskal-Wallis H across the three return flags
# ---------------------------------------------------------------------------
#
# Doubled average ranks on the counted quantity grid (the stats5
# discipline: R2 = 2·cumcount − cnt + 1, exact integer tie handling).
# With doubled rank sums SR2_j = Σ cnt_j(q)·R2(q):
#
#   H  = 3/(n(n+1)) · Σ_j SR2_j²/n_j − 3(n+1)
#   C  = 1 − Σ(t³−t)/(n³−n)          (tie correction)
#   Hc = H / C
#
# Σ_j SR2_j²/n_j is quantized per group with an exact integer floor
# division and summed as integers.

_KW_SCALE = 1_000_000  # 10^6 on the per-group rank-sum terms

KRUSKAL_ORACLE = f"""
WITH li AS (
  SELECT l_returnflag AS flag, CAST(ROUND(l_quantity, 0) AS BIGINT) AS q
  FROM lineitem
),
joint AS (
  SELECT flag, q, COUNT(*)::HUGEINT AS cnt FROM li GROUP BY 1, 2
),
grid AS (
  SELECT q, SUM(cnt) AS cnt,
         2 * SUM(SUM(cnt)) OVER (ORDER BY q
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - SUM(cnt) + 1 AS r2
  FROM joint GROUP BY q
),
groups AS (
  SELECT j.flag, SUM(j.cnt) AS n_j, SUM(j.cnt * g.r2) AS sr2_j
  FROM joint j JOIN grid g ON j.q = g.q
  GROUP BY j.flag
),
totals AS (
  SELECT SUM(n_j) AS n,
         SUM((sr2_j * sr2_j * {_KW_SCALE}) // n_j) AS term_q,
         (SELECT SUM(cnt * cnt * cnt - cnt) FROM grid) AS ties
  FROM groups
)
SELECT n::BIGINT AS n_total,
       (SELECT COUNT(*) FROM groups)::BIGINT AS n_groups,
       ROUND(3.0 * (CAST(term_q AS DOUBLE) / CAST({_KW_SCALE} AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
             - 3.0 * CAST(n + 1 AS DOUBLE), 6) AS h_stat,
       ROUND((3.0 * (CAST(term_q AS DOUBLE) / CAST({_KW_SCALE} AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
             - 3.0 * CAST(n + 1 AS DOUBLE))
             / (1.0 - CAST(ties AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6)
         AS h_tie_corrected
FROM totals
"""


@register("kruskal_wallis_qty_flag", KRUSKAL_ORACLE)
def kruskal_wallis_qty_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H of quantity across return flags:
    one row (n_total, n_groups, h_stat, h_tie_corrected)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("q"),
    )
    joint = li.groupBy("flag", "q").agg(
        F.count(F.lit(1)).cast(_DEC).alias("cnt")
    )
    wq = Window.orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grid = (
        joint.groupBy("q")
        .agg(F.sum("cnt").alias("cnt"))
        .select(
            "q",
            "cnt",
            (2 * F.sum("cnt").over(wq) - F.col("cnt") + 1).alias("r2"),
        )
    )
    groups = (
        joint.join(F.broadcast(grid.select("q", "r2")), "q")
        .groupBy("flag")
        .agg(
            F.sum("cnt").alias("n_j"),
            F.sum(F.col("cnt") * F.col("r2")).alias("sr2_j"),
        )
    )
    term_num = (F.col("sr2_j") * F.col("sr2_j") * F.lit(_KW_SCALE)).cast(_DEC)
    term = ((term_num - F.pmod(term_num, F.col("n_j").cast(_DEC)))
            / F.col("n_j").cast(_DEC)).cast(_DEC)
    ties = grid.agg(
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("ties")
    )
    totals = (
        groups.select(
            F.col("n_j"), term.alias("term_q"), F.lit(1).alias("one")
        )
        .groupBy()
        .agg(
            F.sum("n_j").alias("n"),
            F.sum("term_q").alias("term_q"),
            F.sum("one").cast("bigint").alias("n_groups"),
        )
        .crossJoin(F.broadcast(ties))
    )
    n_d = F.col("n").cast("double")
    h = (
        F.lit(3.0)
        * (F.col("term_q").cast("double") / F.lit(float(_KW_SCALE)))
        / (n_d * (F.col("n") + 1).cast("double"))
        - F.lit(3.0) * (F.col("n") + 1).cast("double")
    )
    c = F.lit(1.0) - F.col("ties").cast("double") / (n_d * n_d * n_d - n_d)
    return totals.select(
        F.col("n").cast("bigint").alias("n_total"),
        "n_groups",
        F.round(h, 6).alias("h_stat"),
        F.round(h / c, 6).alias("h_tie_corrected"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences on order value
# ---------------------------------------------------------------------------
#
# 2×2 panel: md5 treat/control customer buckets × pre/post a fixed
# calendar cutoff (the data spans 1995—2001; the cutoff splits it).
# Cell means are exact integer cent sums over counts; the DiD estimate
# and its unpooled standard error
#   SE² = Σ_cells s²_cell / n_cell,  s² = (ssq − s²/n)/(n−1)
# assemble in one fixed double tree from the exact integer moments.

_DID_CUTOFF = "1998-01-01"
_DID_MD5 = "md5(CAST(o_custkey AS STRING))"

DID_ORACLE = f"""
WITH cells AS (
  SELECT {md5_uniform16_sql(_DID_MD5)} % 2 AS treat,
         CASE WHEN o_orderdate >= TIMESTAMP '{_DID_CUTOFF}' THEN 1 ELSE 0 END
           AS post,
         CAST(FLOOR(o_totalprice * 100) AS HUGEINT) AS cents
  FROM orders
),
agg AS (
  SELECT treat, post,
         COUNT(*)::HUGEINT AS n,
         SUM(cents) AS s,
         SUM(cents * cents) AS ssq
  FROM cells GROUP BY treat, post
),
wide AS (
  SELECT
    MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_tp0,
    MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_tp1,
    MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_cp0,
    MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_cp1,
    MAX(CASE WHEN treat = 1 AND post = 0 THEN s END) AS s_tp0,
    MAX(CASE WHEN treat = 1 AND post = 1 THEN s END) AS s_tp1,
    MAX(CASE WHEN treat = 0 AND post = 0 THEN s END) AS s_cp0,
    MAX(CASE WHEN treat = 0 AND post = 1 THEN s END) AS s_cp1,
    MAX(CASE WHEN treat = 1 AND post = 0 THEN ssq END) AS q_tp0,
    MAX(CASE WHEN treat = 1 AND post = 1 THEN ssq END) AS q_tp1,
    MAX(CASE WHEN treat = 0 AND post = 0 THEN ssq END) AS q_cp0,
    MAX(CASE WHEN treat = 0 AND post = 1 THEN ssq END) AS q_cp1
  FROM agg
),
-- SE² assembled as a FIXED four-term tree over the exact integer
-- moments (never SUM over cells: a 4-double SUM is summation-order
-- dependent across engines)
se AS (
  SELECT *,
    ((CAST(q_tp0 AS DOUBLE)
      - CAST(s_tp0 AS DOUBLE) * CAST(s_tp0 AS DOUBLE) / CAST(n_tp0 AS DOUBLE))
     / CAST(n_tp0 - 1 AS DOUBLE) / CAST(n_tp0 AS DOUBLE)
     + (CAST(q_tp1 AS DOUBLE)
        - CAST(s_tp1 AS DOUBLE) * CAST(s_tp1 AS DOUBLE)
          / CAST(n_tp1 AS DOUBLE))
       / CAST(n_tp1 - 1 AS DOUBLE) / CAST(n_tp1 AS DOUBLE))
    + ((CAST(q_cp0 AS DOUBLE)
        - CAST(s_cp0 AS DOUBLE) * CAST(s_cp0 AS DOUBLE)
          / CAST(n_cp0 AS DOUBLE))
       / CAST(n_cp0 - 1 AS DOUBLE) / CAST(n_cp0 AS DOUBLE)
       + (CAST(q_cp1 AS DOUBLE)
          - CAST(s_cp1 AS DOUBLE) * CAST(s_cp1 AS DOUBLE)
            / CAST(n_cp1 AS DOUBLE))
         / CAST(n_cp1 - 1 AS DOUBLE) / CAST(n_cp1 AS DOUBLE)) AS se2
  FROM wide
)
SELECT n_tp0::BIGINT AS n_treat_pre, n_tp1::BIGINT AS n_treat_post,
       n_cp0::BIGINT AS n_ctrl_pre, n_cp1::BIGINT AS n_ctrl_post,
       ROUND(CAST(s_tp1 AS DOUBLE) / n_tp1
             - CAST(s_tp0 AS DOUBLE) / n_tp0, 4) AS diff_treat_cents,
       ROUND(CAST(s_cp1 AS DOUBLE) / n_cp1
             - CAST(s_cp0 AS DOUBLE) / n_cp0, 4) AS diff_ctrl_cents,
       ROUND((CAST(s_tp1 AS DOUBLE) / n_tp1 - CAST(s_tp0 AS DOUBLE) / n_tp0)
             - (CAST(s_cp1 AS DOUBLE) / n_cp1
                - CAST(s_cp0 AS DOUBLE) / n_cp0), 4) AS did_cents,
       ROUND(SQRT(se2), 4) AS se_cents,
       ROUND(((CAST(s_tp1 AS DOUBLE) / n_tp1 - CAST(s_tp0 AS DOUBLE) / n_tp0)
              - (CAST(s_cp1 AS DOUBLE) / n_cp1
                 - CAST(s_cp0 AS DOUBLE) / n_cp0)) / SQRT(se2), 6)
         AS z_score
FROM se
"""


@register("did_order_value", DID_ORACLE)
def did_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on order value cents over the md5
    treat/control × pre/post panel: one row with cell counts, the two
    first differences, the DiD estimate, its SE, and the z-score."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.select(
        (F.expr(md5_uniform16_spark_sql(_DID_MD5)) % 2).alias("treat"),
        F.when(
            F.col("o_orderdate") >= F.lit(_DID_CUTOFF).cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("post"),
        F.floor(F.col("o_totalprice") * 100).cast(_DEC).alias("cents"),
    )
    agg = cells.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ssq"),
    )

    def _cell(t: int, p: int, col: str):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col(col))
        )

    wide = agg.groupBy().agg(
        _cell(1, 0, "n").alias("n_tp0"),
        _cell(1, 1, "n").alias("n_tp1"),
        _cell(0, 0, "n").alias("n_cp0"),
        _cell(0, 1, "n").alias("n_cp1"),
        _cell(1, 0, "s").alias("s_tp0"),
        _cell(1, 1, "s").alias("s_tp1"),
        _cell(0, 0, "s").alias("s_cp0"),
        _cell(0, 1, "s").alias("s_cp1"),
        _cell(1, 0, "ssq").alias("q_tp0"),
        _cell(1, 1, "ssq").alias("q_tp1"),
        _cell(0, 0, "ssq").alias("q_cp0"),
        _cell(0, 1, "ssq").alias("q_cp1"),
    )

    def _var_over_n(tag: str):
        # (ssq − s²/n)/(n−1)/n on one cell's exact integer moments
        n_c = F.col(f"n_{tag}").cast("double")
        s_c = F.col(f"s_{tag}").cast("double")
        q_c = F.col(f"q_{tag}").cast("double")
        return (q_c - s_c * s_c / n_c) / (
            F.col(f"n_{tag}") - 1
        ).cast("double") / n_c

    # FIXED four-term tree, grouped exactly like the oracle string
    se2 = (_var_over_n("tp0") + _var_over_n("tp1")) + (
        _var_over_n("cp0") + _var_over_n("cp1")
    )
    wide = wide.withColumn("se2", se2)
    dt = (
        F.col("s_tp1").cast("double") / F.col("n_tp1").cast("double")
        - F.col("s_tp0").cast("double") / F.col("n_tp0").cast("double")
    )
    dc = (
        F.col("s_cp1").cast("double") / F.col("n_cp1").cast("double")
        - F.col("s_cp0").cast("double") / F.col("n_cp0").cast("double")
    )
    return wide.select(
        F.col("n_tp0").cast("bigint").alias("n_treat_pre"),
        F.col("n_tp1").cast("bigint").alias("n_treat_post"),
        F.col("n_cp0").cast("bigint").alias("n_ctrl_pre"),
        F.col("n_cp1").cast("bigint").alias("n_ctrl_post"),
        F.round(dt, 4).alias("diff_treat_cents"),
        F.round(dc, 4).alias("diff_ctrl_cents"),
        F.round(dt - dc, 4).alias("did_cents"),
        F.round(F.sqrt("se2"), 4).alias("se_cents"),
        F.round((dt - dc) / F.sqrt("se2"), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Competing-risks cumulative incidence (Aalen-Johansen)
# ---------------------------------------------------------------------------
#
# The third survival estimand: after a user's first view, TWO events
# compete for "what happens first" — purchase or signup — and naive
# per-cause 1−KM overestimates both (it treats the competing event as
# censoring). The Aalen-Johansen estimator fixes this:
#
#   CIF_k(t) = Σ_{s<=t} S(s⁻) · d_k(s) / n(s)
#
# with S the OVERALL (all-cause) KM survival and S(s⁻) its value just
# before s (the LAG of the log-cumsum). The estimator satisfies the
# identity CIF_1 + CIF_2 + S = 1 at every event time — pinned in
# tests/test_plan_shapes_r11b.py.
#
# Parity: the duration grid is calendar-bounded; S and both CIFs are
# ORDERED window cumsums in dur order (one evaluation sequence on both
# engines, the KM/RMST convention); outputs rounded at 6 dp.

_CR_TAU = 30  # report horizon (days)

COMPETING_RISKS_ORACLE = """
WITH bounds AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS fs
  FROM events
  GROUP BY user_id
),
durs AS (
  SELECT CASE
           WHEN fp IS NOT NULL AND fp >= fv
                AND (fs IS NULL OR fs < fv OR fp <= fs)
             THEN date_diff('day', CAST(fv AS DATE), CAST(fp AS DATE))
           WHEN fs IS NOT NULL AND fs >= fv
             THEN date_diff('day', CAST(fv AS DATE), CAST(fs AS DATE))
           ELSE date_diff('day', CAST(fv AS DATE), b.max_day)
         END AS dur,
         CASE
           WHEN fp IS NOT NULL AND fp >= fv
                AND (fs IS NULL OR fs < fv OR fp <= fs) THEN 1
           WHEN fs IS NOT NULL AND fs >= fv THEN 2
           ELSE 0
         END AS cause
  FROM firsts f CROSS JOIN bounds b
  WHERE fv IS NOT NULL
),
grid AS (
  SELECT dur,
         COUNT(*)::HUGEINT AS n_at,
         SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END)::HUGEINT AS d1_at,
         SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END)::HUGEINT AS d2_at
  FROM durs GROUP BY dur
),
risk AS (
  SELECT dur, d1_at, d2_at,
         SUM(n_at) OVER (ORDER BY dur DESC) AS n_risk
  FROM grid
),
steps AS (
  SELECT dur, d1_at, d2_at, n_risk,
         SUM(LN(1.0 - CAST(d1_at + d2_at AS DOUBLE) / n_risk))
           OVER (ORDER BY dur) AS log_s
  FROM risk
  WHERE d1_at + d2_at > 0
),
cifs AS (
  SELECT dur, d1_at, d2_at, n_risk, log_s,
         EXP(COALESCE(LAG(log_s) OVER (ORDER BY dur), 0.0)) AS s_prev
  FROM steps
),
acc AS (
  SELECT dur, d1_at, d2_at, n_risk, log_s,
         SUM(s_prev * CAST(d1_at AS DOUBLE) / n_risk)
           OVER (ORDER BY dur) AS cif1,
         SUM(s_prev * CAST(d2_at AS DOUBLE) / n_risk)
           OVER (ORDER BY dur) AS cif2
  FROM cifs
)
SELECT CAST(dur AS BIGINT) AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d1_at AS BIGINT) AS d_purchase,
       CAST(d2_at AS BIGINT) AS d_signup,
       ROUND(cif1, 6) AS cif_purchase,
       ROUND(cif2, 6) AS cif_signup,
       ROUND(EXP(log_s), 6) AS survival_all_cause
FROM acc
WHERE dur <= {tau}
""".format(tau=_CR_TAU)


@register("competing_risks_incidence", COMPETING_RISKS_ORACLE)
def competing_risks_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence of purchase vs signup after
    first view, right-censored at end-of-data: (t_days, n_risk,
    d_purchase, d_signup, cif_purchase, cif_signup,
    survival_all_cause) at event days <= τ."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(F.max(F.to_date("ts")).alias("max_day"))
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "fp"
        ),
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "fs"
        ),
    )
    p_first = (
        F.col("fp").isNotNull()
        & (F.col("fp") >= F.col("fv"))
        & (
            F.col("fs").isNull()
            | (F.col("fs") < F.col("fv"))
            | (F.col("fp") <= F.col("fs"))
        )
    )
    s_first = F.col("fs").isNotNull() & (F.col("fs") >= F.col("fv"))
    durs = (
        firsts.where(F.col("fv").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(p_first, F.datediff(F.to_date("fp"), F.to_date("fv")))
            .when(s_first, F.datediff(F.to_date("fs"), F.to_date("fv")))
            .otherwise(F.datediff(F.col("max_day"), F.to_date("fv")))
            .alias("dur"),
            F.when(p_first, 1).when(s_first, 2).otherwise(0).alias("cause"),
        )
    )
    grid = durs.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum(F.when(F.col("cause") == 1, 1).otherwise(0)).alias("d1_at"),
        F.sum(F.when(F.col("cause") == 2, 1).otherwise(0)).alias("d2_at"),
    )
    risk = grid.select(
        "dur",
        "d1_at",
        "d2_at",
        F.sum("n_at").over(Window.orderBy(F.col("dur").desc())).alias(
            "n_risk"
        ),
    )
    wd = Window.orderBy("dur")
    steps = risk.where(F.col("d1_at") + F.col("d2_at") > 0).select(
        "dur",
        "d1_at",
        "d2_at",
        "n_risk",
        F.sum(
            F.log(
                F.lit(1.0)
                - (F.col("d1_at") + F.col("d2_at")).cast("double")
                / F.col("n_risk")
            )
        ).over(wd).alias("log_s"),
    )
    cifs = steps.withColumn(
        "s_prev",
        F.exp(F.coalesce(F.lag("log_s").over(wd), F.lit(0.0))),
    )
    acc = cifs.select(
        "dur",
        "d1_at",
        "d2_at",
        "n_risk",
        "log_s",
        F.sum(
            F.col("s_prev") * F.col("d1_at").cast("double") / F.col("n_risk")
        ).over(wd).alias("cif1"),
        F.sum(
            F.col("s_prev") * F.col("d2_at").cast("double") / F.col("n_risk")
        ).over(wd).alias("cif2"),
    )
    return acc.where(F.col("dur") <= _CR_TAU).select(
        F.col("dur").cast("bigint").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d1_at").cast("bigint").alias("d_purchase"),
        F.col("d2_at").cast("bigint").alias("d_signup"),
        F.round("cif1", 6).alias("cif_purchase"),
        F.round("cif2", 6).alias("cif_signup"),
        F.round(F.exp("log_s"), 6).alias("survival_all_cause"),
    )

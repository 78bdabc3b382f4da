"""Statistical-insight battery #5: rank and contingency tests.

Three nonparametric/categorical hypothesis tests every analytics
engine's stats tier ships (extension surface alongside
``stats2``–``stats4``):

- ``spearman_qty_disc``: Spearman rank correlation between lineitem
  quantity and discount per return flag — the monotonic-association
  screen that Pearson (``stats_correlation_battery``) misses.
- ``mannwhitney_qty_flag``: tie-corrected Mann-Whitney U (Wilcoxon
  rank-sum) comparing the quantity distribution of returned ('R') vs
  delivered ('N') lineitems — the nonparametric two-sample test.
- ``chi2_status_priority``: chi-square test of independence on the
  order status × priority contingency grid, with Cramér's V effect
  size — the categorical-association readout.

Spark-first / 100 TB shape:
- rank statistics over UNBOUNDED value domains need a data-scale sort;
  these queries instead rank over BOUNDED grids (quantity ≤ 50
  distinct values, discount ≤ 11, status×priority = 15 cells): ONE
  fact-scale groupBy shuffle produces per-value counts, and every
  window/join after that runs on the tiny grid (the midhinge /
  equi-depth precedent). Average-rank tie handling is exact on a
  counted grid: rank_min = cumcount − cnt + 1, doubled average rank
  R2 = 2·cumcount − cnt + 1 (integer, no /2).
- Spearman on doubled ranks equals Spearman on average ranks (Pearson
  is scale-invariant and both variables carry the same ×2).

Arithmetic parity (the stats4 contract):
- every sum/product is exact integer (Spark DECIMAL(38,0), DuckDB
  HUGEINT) — order-free — until a FIXED scalar tree assembles the
  statistic in doubles (int→double and each double op correctly
  rounded ⇒ bit-equal cross-engine pre-round);
- chi-square per-cell terms are quantized to floor(num·10⁹/den) with
  an EXACT integer division (pmod-subtract on Spark, ``//`` HUGEINT
  in DuckDB) and summed as integers — the monthly_seasonal_index
  closure of the summation-order class; quantization bias < 15/10⁹,
  identical on both engines by construction;
- quantity/discount land on integer grids via round(x) / round(100x)
  — values sit ~1e-15 off integers, nowhere near the .5 rounding
  boundary, so Spark HALF_UP and DuckDB banker's rounding agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

_DEC = "decimal(38,0)"

# ---------------------------------------------------------------------------
# Spearman rank correlation on bounded grids
# ---------------------------------------------------------------------------

SPEARMAN_ORACLE = """
WITH li AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
         CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS d
  FROM lineitem
),
joint AS (
  SELECT flag, q, d, COUNT(*)::HUGEINT AS n_qd FROM li GROUP BY 1, 2, 3
),
gq AS (
  SELECT flag, q, SUM(n_qd) AS cnt,
         2 * SUM(SUM(n_qd)) OVER (PARTITION BY flag ORDER BY q
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - SUM(n_qd) + 1 AS r2q
  FROM joint GROUP BY flag, q
),
gd AS (
  SELECT flag, d, SUM(n_qd) AS cnt,
         2 * SUM(SUM(n_qd)) OVER (PARTITION BY flag ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - SUM(n_qd) + 1 AS r2d
  FROM joint GROUP BY flag, d
),
sums AS (
  SELECT j.flag,
         SUM(j.n_qd) AS n,
         SUM(j.n_qd * gq.r2q) AS sx,
         SUM(j.n_qd * gd.r2d) AS sy,
         SUM(j.n_qd * gq.r2q * gq.r2q) AS sxx,
         SUM(j.n_qd * gd.r2d * gd.r2d) AS syy,
         SUM(j.n_qd * gq.r2q * gd.r2d) AS sxy
  FROM joint j
  JOIN gq ON j.flag = gq.flag AND j.q = gq.q
  JOIN gd ON j.flag = gd.flag AND j.d = gd.d
  GROUP BY j.flag
)
SELECT flag AS returnflag,
       n::BIGINT AS n_rows,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6)
         AS rho_spearman
FROM sums
"""


@register("spearman_qty_disc", SPEARMAN_ORACLE)
def spearman_qty_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag Spearman rho between quantity and discount:
    (returnflag, n_rows, rho_spearman)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("q"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("d"),
    )
    joint = li.groupBy("flag", "q", "d").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n_qd")
    )

    def _grid(col: str, r2: str) -> DataFrame:
        # doubled average rank on the counted value grid:
        # R2 = 2·cumcount − cnt + 1 (exact integer tie handling)
        w = (
            Window.partitionBy("flag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            joint.groupBy("flag", col)
            .agg(F.sum("n_qd").alias("cnt"))
            .select(
                "flag",
                col,
                (2 * F.sum("cnt").over(w) - F.col("cnt") + 1).alias(r2),
            )
        )

    gq = _grid("q", "r2q")
    gd = _grid("d", "r2d")
    sums = (
        joint.join(F.broadcast(gq), ["flag", "q"])
        .join(F.broadcast(gd), ["flag", "d"])
        .groupBy("flag")
        .agg(
            F.sum("n_qd").alias("n"),
            F.sum(F.col("n_qd") * F.col("r2q")).alias("sx"),
            F.sum(F.col("n_qd") * F.col("r2d")).alias("sy"),
            F.sum(F.col("n_qd") * F.col("r2q") * F.col("r2q")).alias("sxx"),
            F.sum(F.col("n_qd") * F.col("r2d") * F.col("r2d")).alias("syy"),
            F.sum(F.col("n_qd") * F.col("r2q") * F.col("r2d")).alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return sums.select(
        F.col("flag").alias("returnflag"),
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("rho_spearman"),
    )


# ---------------------------------------------------------------------------
# Tie-corrected Mann-Whitney U
# ---------------------------------------------------------------------------

MANNWHITNEY_ORACLE = """
WITH li AS (
  SELECT l_returnflag AS flag, CAST(ROUND(l_quantity, 0) AS BIGINT) AS q
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
),
grid AS (
  SELECT q,
         SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END)::HUGEINT AS c1,
         COUNT(*)::HUGEINT AS cnt
  FROM li GROUP BY q
),
ranked AS (
  SELECT q, c1, cnt,
         2 * SUM(cnt) OVER (ORDER BY q
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + 1 AS r2
  FROM grid
),
sums AS (
  SELECT SUM(c1) AS n1, SUM(cnt - c1) AS n2, SUM(cnt) AS n,
         SUM(c1 * r2) AS sr1,
         SUM(cnt * cnt * cnt - cnt) AS ties
  FROM ranked
)
SELECT n1::BIGINT AS n_returned,
       n2::BIGINT AS n_delivered,
       (sr1 - n1 * (n1 + 1) - n1 * n2)::BIGINT AS u_doubled_centered,
       ROUND(CAST(sr1 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
             / (2 * SQRT(CAST(n1 * n2 * ((n + 1) * n * (n - 1) - ties)
                              AS DOUBLE)
                         / CAST(12 * n * (n - 1) AS DOUBLE))), 6)
         AS z_value
FROM sums
"""


@register("mannwhitney_qty_flag", MANNWHITNEY_ORACLE)
def mannwhitney_qty_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (normal approximation, tie-corrected) comparing
    quantity of returned vs delivered lineitems: (n_returned,
    n_delivered, u_doubled_centered, z_value). u_doubled_centered is
    the exact integer 2·U1 − n1·n2 (2× avoids the /2 in both the rank
    sum and the null mean)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "N")
    )
    grid = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_quantity"), 0).cast("bigint").alias("q"),
        )
        .groupBy("q")
        .agg(
            F.sum(F.when(F.col("flag") == "R", 1).otherwise(0))
            .cast(_DEC)
            .alias("c1"),
            F.count(F.lit(1)).cast(_DEC).alias("cnt"),
        )
    )
    # the window runs over the ≤51-row quantity grid — bounded at any
    # corpus scale, so the unpartitioned ORDER BY is a single tiny task
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = grid.select(
        "c1",
        "cnt",
        (2 * F.sum("cnt").over(w) - F.col("cnt") + 1).alias("r2"),
    )
    sums = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("cnt") - F.col("c1")).alias("n2"),
        F.sum("cnt").alias("n"),
        F.sum(F.col("c1") * F.col("r2")).alias("sr1"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("ties"),
    )
    u2c = F.col("sr1") - F.col("n1") * (F.col("n1") + 1) - F.col("n1") * F.col("n2")
    var_num = (
        F.col("n1")
        * F.col("n2")
        * (
            (F.col("n") + 1) * F.col("n") * (F.col("n") - 1)
            - F.col("ties")
        )
    )
    var_den = 12 * F.col("n") * (F.col("n") - 1)
    return sums.select(
        F.col("n1").cast("bigint").alias("n_returned"),
        F.col("n2").cast("bigint").alias("n_delivered"),
        u2c.cast("bigint").alias("u_doubled_centered"),
        F.round(
            u2c.cast("double")
            / (2 * F.sqrt(var_num.cast("double") / var_den.cast("double"))),
            6,
        ).alias("z_value"),
    )


# ---------------------------------------------------------------------------
# Chi-square independence + Cramér's V on the status × priority grid
# ---------------------------------------------------------------------------

_CHI2_SCALE = 1_000_000_000  # 10^9 quantization of per-cell terms

CHI2_ORACLE = f"""
WITH obs AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*)::HUGEINT AS o
  FROM orders GROUP BY 1, 2
),
margins AS (
  SELECT s, p, o,
         SUM(o) OVER (PARTITION BY s) AS r,
         SUM(o) OVER (PARTITION BY p) AS c,
         SUM(o) OVER () AS n
  FROM obs
),
cells AS (
  SELECT n,
         ((o * n - r * c) * (o * n - r * c) * {_CHI2_SCALE})
           // (r * c * n) AS qterm
  FROM margins
),
dims AS (
  SELECT COUNT(DISTINCT s) AS nr, COUNT(DISTINCT p) AS nc FROM obs
)
SELECT MAX(n)::BIGINT AS n_total,
       ((SELECT nr FROM dims) - 1) * ((SELECT nc FROM dims) - 1) AS dof,
       ROUND(CAST(SUM(qterm) AS DOUBLE) / CAST({_CHI2_SCALE} AS DOUBLE), 6)
         AS chi2,
       ROUND(SQRT((CAST(SUM(qterm) AS DOUBLE) / CAST({_CHI2_SCALE} AS DOUBLE))
                  / (CAST(MAX(n) AS DOUBLE)
                     * CAST(LEAST((SELECT nr FROM dims),
                                  (SELECT nc FROM dims)) - 1 AS DOUBLE))), 6)
         AS cramer_v
FROM cells
"""


@register("chi2_status_priority", CHI2_ORACLE)
def chi2_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test + Cramér's V on order status ×
    priority: (n_total, dof, chi2, cramer_v). Zero-count grid combos
    contribute a zero term on both engines (absent cells have o=0 ⇒
    the expected-count term r·c/n is still what the statistic needs —
    but an absent (s,p) pair contributes (0·n − r·c)²/(r·c·n) = r·c/n,
    so the grid is completed explicitly on both sides via the
    cross-margin construction; with this corpus all 15 cells are
    populated and the completion is a no-op either way)."""
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).cast(_DEC).alias("o"))
    # windows over the ≤15-cell contingency grid — bounded at any scale
    margins = obs.select(
        "s",
        "p",
        "o",
        F.sum("o").over(Window.partitionBy("s")).alias("r"),
        F.sum("o").over(Window.partitionBy("p")).alias("c"),
        F.sum("o").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    dev = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    num = (dev * dev * F.lit(_CHI2_SCALE)).cast(_DEC)
    den = (F.col("r") * F.col("c") * F.col("n")).cast(_DEC)
    cells = margins.select(
        "s",
        "p",
        "n",
        ((num - F.pmod(num, den)) / den).cast(_DEC).alias("qterm"),
    )
    dims = obs.agg(
        F.countDistinct("s").alias("nr"), F.countDistinct("p").alias("nc")
    )
    chi2_d = F.sum("qterm").cast("double") / F.lit(float(_CHI2_SCALE))
    return (
        cells.crossJoin(F.broadcast(dims))
        .groupBy()
        .agg(
            F.max("n").cast("bigint").alias("n_total"),
            ((F.max("nr") - 1) * (F.max("nc") - 1))
            .cast("bigint")
            .alias("dof"),
            F.round(chi2_d, 6).alias("chi2"),
            F.round(
                F.sqrt(
                    chi2_d
                    / (
                        F.max("n").cast("double")
                        * (F.least(F.max("nr"), F.max("nc")) - 1).cast("double")
                    )
                ),
                6,
            ).alias("cramer_v"),
        )
    )


# ---------------------------------------------------------------------------
# Maximum drawdown of the daily revenue series
# ---------------------------------------------------------------------------
#
# The classic peak-to-trough risk statistic over the daily revenue
# level series: the largest drop from a running maximum to a later
# day. All arithmetic is exact integer cents on the bounded calendar
# grid (the ewma/acf precedent: the window runs over ~2400 day rows,
# never over fact rows); peak/trough day identification is integer
# equality with earliest-day tie-breaks, so there is no float anywhere.

MAXDD_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS day,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1
),
runm AS (
  SELECT day, cents,
         MAX(cents) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM daily
),
mx AS (SELECT MAX(peak - cents) AS maxdd FROM runm),
tr AS (
  SELECT r.day, r.cents, r.peak
  FROM runm r, mx
  WHERE r.peak - r.cents = mx.maxdd
  ORDER BY r.day LIMIT 1
),
pk AS (
  SELECT MIN(d.day) AS peak_day
  FROM daily d, tr
  WHERE d.day <= tr.day AND d.cents = tr.peak
)
SELECT CAST(pk.peak_day AS VARCHAR) AS peak_day,
       CAST(tr.day AS VARCHAR) AS trough_day,
       tr.peak::BIGINT AS peak_cents,
       tr.cents::BIGINT AS trough_cents,
       (tr.peak - tr.cents)::BIGINT AS drawdown_cents
FROM pk, tr
"""


@register("max_drawdown_daily_revenue", MAXDD_ORACLE)
def max_drawdown_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest peak-to-trough drop of daily revenue: (peak_day,
    trough_day, peak_cents, trough_cents, drawdown_cents); earliest
    day wins ties at both ends."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    runm = daily.select("day", "cents", F.max("cents").over(w).alias("peak"))
    mx = runm.agg(F.max(F.col("peak") - F.col("cents")).alias("maxdd"))
    # earliest trough day achieving the max drawdown, with its cents
    # and running peak, via a lexicographic struct-min — one aggregate,
    # no sort
    tr = (
        runm.crossJoin(F.broadcast(mx))
        .where(F.col("peak") - F.col("cents") == F.col("maxdd"))
        .agg(F.min(F.struct("day", "cents", "peak")).alias("t"))
        .select(
            F.col("t.day").alias("trough_day"),
            F.col("t.cents").alias("trough_cents"),
            F.col("t.peak").alias("peak_cents"),
        )
    )
    pk = (
        daily.crossJoin(F.broadcast(tr))
        .where(
            (F.col("day") <= F.col("trough_day"))
            & (F.col("cents") == F.col("peak_cents"))
        )
        .groupBy("trough_day", "trough_cents", "peak_cents")
        .agg(F.min("day").alias("peak_day"))
    )
    return pk.select(
        F.col("peak_day").cast("string").alias("peak_day"),
        F.col("trough_day").cast("string").alias("trough_day"),
        F.col("peak_cents").cast("bigint").alias("peak_cents"),
        F.col("trough_cents").cast("bigint").alias("trough_cents"),
        (F.col("peak_cents") - F.col("trough_cents"))
        .cast("bigint")
        .alias("drawdown_cents"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b on the bounded joint grid
# ---------------------------------------------------------------------------
#
# Rank correlation #2: concordant/discordant pair counts. On a counted
# joint grid this is EXACT integer combinatorics — each concordant
# pair {cellA, cellB} (A strictly above-right of B) is counted once
# from its upper cell via a strict double-inequality self-join of the
# ≤550-cell grid (grid² ≈ 3·10⁵ comparisons — a CONSTANT, data-scale-
# free). tau-b's tie normalization uses the doubled forms
# A = n(n−1) − Σt_v(t_v−1), B likewise for w, and
# tau = 2(C−D)/(√A·√B) — one fixed double tree.

KENDALL_ORACLE = """
WITH li AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_quantity, 0) AS BIGINT) AS q,
         CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS d
  FROM lineitem
),
joint AS (
  SELECT flag, q, d, COUNT(*)::HUGEINT AS n_qd FROM li GROUP BY 1, 2, 3
),
conc AS (
  SELECT a.flag,
         SUM(CASE WHEN b.q < a.q AND b.d < a.d THEN a.n_qd * b.n_qd
                  ELSE 0 END) AS c,
         SUM(CASE WHEN b.q < a.q AND b.d > a.d THEN a.n_qd * b.n_qd
                  ELSE 0 END) AS disc
  FROM joint a JOIN joint b ON a.flag = b.flag
  GROUP BY a.flag
),
tq AS (
  SELECT flag, SUM(cnt * (cnt - 1)) AS t1, SUM(cnt) AS n FROM (
    SELECT flag, q, SUM(n_qd) AS cnt FROM joint GROUP BY flag, q
  ) GROUP BY flag
),
td AS (
  SELECT flag, SUM(cnt * (cnt - 1)) AS t2 FROM (
    SELECT flag, d, SUM(n_qd) AS cnt FROM joint GROUP BY flag, d
  ) GROUP BY flag
)
SELECT conc.flag AS returnflag,
       tq.n::BIGINT AS n_rows,
       conc.c::BIGINT AS concordant,
       conc.disc::BIGINT AS discordant,
       ROUND(2 * CAST(conc.c - conc.disc AS DOUBLE)
             / (SQRT(CAST(tq.n * (tq.n - 1) - tq.t1 AS DOUBLE))
                * SQRT(CAST(tq.n * (tq.n - 1) - td.t2 AS DOUBLE))), 6)
         AS tau_b
FROM conc
JOIN tq ON conc.flag = tq.flag
JOIN td ON conc.flag = td.flag
"""


@register("kendall_tau_qty_disc", KENDALL_ORACLE)
def kendall_tau_qty_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag Kendall tau-b between quantity and discount:
    (returnflag, n_rows, concordant, discordant, tau_b)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("q"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("d"),
    )
    joint = li.groupBy("flag", "q", "d").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n_qd")
    )
    a, b = joint.alias("a"), joint.alias("b")
    conc = (
        a.join(F.broadcast(b), F.col("a.flag") == F.col("b.flag"))
        .groupBy(F.col("a.flag").alias("flag"))
        .agg(
            F.sum(
                F.when(
                    (F.col("b.q") < F.col("a.q"))
                    & (F.col("b.d") < F.col("a.d")),
                    F.col("a.n_qd") * F.col("b.n_qd"),
                ).otherwise(F.lit(0).cast(_DEC))
            ).alias("c"),
            F.sum(
                F.when(
                    (F.col("b.q") < F.col("a.q"))
                    & (F.col("b.d") > F.col("a.d")),
                    F.col("a.n_qd") * F.col("b.n_qd"),
                ).otherwise(F.lit(0).cast(_DEC))
            ).alias("disc"),
        )
    )
    tq = (
        joint.groupBy("flag", "q")
        .agg(F.sum("n_qd").alias("cnt"))
        .groupBy("flag")
        .agg(
            F.sum(F.col("cnt") * (F.col("cnt") - 1)).alias("t1"),
            F.sum("cnt").alias("n"),
        )
    )
    td = (
        joint.groupBy("flag", "d")
        .agg(F.sum("n_qd").alias("cnt"))
        .groupBy("flag")
        .agg(F.sum(F.col("cnt") * (F.col("cnt") - 1)).alias("t2"))
    )
    out = conc.join(F.broadcast(tq), "flag").join(F.broadcast(td), "flag")
    n = F.col("n")
    ta = (n * (n - 1) - F.col("t1")).cast("double")
    tb = (n * (n - 1) - F.col("t2")).cast("double")
    return out.select(
        F.col("flag").alias("returnflag"),
        n.cast("bigint").alias("n_rows"),
        F.col("c").cast("bigint").alias("concordant"),
        F.col("disc").cast("bigint").alias("discordant"),
        F.round(
            2 * (F.col("c") - F.col("disc")).cast("double")
            / (F.sqrt(ta) * F.sqrt(tb)),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Hodges-Lehmann two-sample location shift
# ---------------------------------------------------------------------------
#
# The robust effect-size companion to Mann-Whitney: the median of all
# n1·n2 pairwise differences q_R − q_N. On counted grids the
# difference distribution is the 50×50 cross of the two value grids
# (≤2601 weighted cells — constant at any scale); the exact weighted
# median picks the lower/upper middle order statistics by cumulative
# weight and averages them (the only non-integer op is that final /2).

HODGES_LEHMANN_ORACLE = """
WITH li AS (
  SELECT l_returnflag AS flag, CAST(ROUND(l_quantity, 0) AS BIGINT) AS q
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
),
g1 AS (SELECT q, COUNT(*)::HUGEINT AS c FROM li WHERE flag = 'R' GROUP BY q),
g2 AS (SELECT q, COUNT(*)::HUGEINT AS c FROM li WHERE flag = 'N' GROUP BY q),
diffs AS (
  SELECT g1.q - g2.q AS delta, SUM(g1.c * g2.c) AS w
  FROM g1 CROSS JOIN g2
  GROUP BY g1.q - g2.q
),
cum AS (
  SELECT delta, w,
         SUM(w) OVER (ORDER BY delta
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(w) OVER () AS total
  FROM diffs
),
lo AS (SELECT MIN(delta) AS d1 FROM cum WHERE cw >= (total + 1) // 2),
hi AS (SELECT MIN(delta) AS d2 FROM cum WHERE cw >= (total + 2) // 2)
SELECT (SELECT MAX(total) FROM cum)::BIGINT AS n_pairs,
       lo.d1::BIGINT AS lower_mid,
       hi.d2::BIGINT AS upper_mid,
       ROUND(CAST(lo.d1 + hi.d2 AS DOUBLE) / 2, 6) AS hl_shift
FROM lo, hi
"""


@register("hodges_lehmann_qty_shift", HODGES_LEHMANN_ORACLE)
def hodges_lehmann_qty_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann estimate of the quantity shift between returned
    and delivered lineitems: (n_pairs, lower_mid, upper_mid,
    hl_shift)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "N")
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("q"),
    )
    g1 = li.where(F.col("flag") == "R").groupBy("q").agg(
        F.count(F.lit(1)).cast(_DEC).alias("c1")
    )
    g2 = li.where(F.col("flag") == "N").groupBy("q").agg(
        F.count(F.lit(1)).cast(_DEC).alias("c2")
    )
    diffs = (
        g1.crossJoin(F.broadcast(g2.select(F.col("q").alias("q2"), "c2")))
        .groupBy((F.col("q") - F.col("q2")).alias("delta"))
        .agg(F.sum(F.col("c1") * F.col("c2")).alias("w"))
    )
    wc = Window.orderBy("delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.orderBy("delta").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = diffs.select(
        "delta",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("total"),
    )
    # (total+1) div 2 exactly, via pmod-subtract (decimal has no DIV)
    def _half(off: int):
        t = F.col("total") + off
        return (t - F.pmod(t, F.lit(2))) / 2

    lo = cum.where(F.col("cw") >= _half(1)).agg(F.min("delta").alias("d1"))
    hi = cum.where(F.col("cw") >= _half(2)).agg(F.min("delta").alias("d2"))
    tot = cum.agg(F.max("total").cast("bigint").alias("n_pairs"))
    return (
        tot.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_pairs",
            F.col("d1").cast("bigint").alias("lower_mid"),
            F.col("d2").cast("bigint").alias("upper_mid"),
            F.round((F.col("d1") + F.col("d2")).cast("double") / 2, 6).alias(
                "hl_shift"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest
# ---------------------------------------------------------------------------
#
# The forecasting-evaluation primitive: score the two standard
# baseline models every real forecast must beat — naive (tomorrow =
# today) and seasonal naive (tomorrow = same weekday last week) — on
# the daily revenue series. Errors are exact integer cents; MAPE
# per-day ratios are quantized to floor(|err|·10⁹/actual) integers
# before summing (the summation-order closure), and each metric does
# ONE double division at the end. Windows run over the bounded
# calendar grid.

_BT_SCALE = 1_000_000_000  # 10^9 MAPE quantization

BACKTEST_ORACLE = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT day, cents,
         LAG(cents, 1) OVER (ORDER BY day) AS f_naive,
         LAG(cents, 7) OVER (ORDER BY day) AS f_snaive
  FROM daily
),
scored AS (
  SELECT 'naive' AS model,
         ABS(cents - f_naive)::HUGEINT AS abs_err,
         (ABS(cents - f_naive)::HUGEINT * {_BT_SCALE}) // cents AS ape_q
  FROM lagged WHERE f_naive IS NOT NULL
  UNION ALL
  SELECT 'seasonal_naive',
         ABS(cents - f_snaive)::HUGEINT,
         (ABS(cents - f_snaive)::HUGEINT * {_BT_SCALE}) // cents
  FROM lagged WHERE f_snaive IS NOT NULL
)
SELECT model,
       COUNT(*)::BIGINT AS n_days,
       ROUND(CAST(SUM(abs_err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
         AS mae_cents,
       ROUND(CAST(SUM(ape_q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / CAST({_BT_SCALE} AS DOUBLE) * CAST(100 AS DOUBLE), 6)
         AS mape_pct
FROM scored GROUP BY model
"""


@register("seasonal_naive_backtest", BACKTEST_ORACLE)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE/MAPE of the naive and seasonal-naive daily-revenue
    baselines: (model, n_days, mae_cents, mape_pct)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "cents",
        F.lag("cents", 1).over(w).alias("f_naive"),
        F.lag("cents", 7).over(w).alias("f_snaive"),
    )

    def _scored(fcol: str, model: str) -> DataFrame:
        err = F.abs(F.col("cents") - F.col(fcol)).cast("decimal(38,0)")
        num = err * F.lit(_BT_SCALE)
        ape_q = ((num - F.pmod(num, F.col("cents").cast("decimal(38,0)")))
                 / F.col("cents").cast("decimal(38,0)")).cast("decimal(38,0)")
        return lagged.where(F.col(fcol).isNotNull()).select(
            F.lit(model).alias("model"),
            err.alias("abs_err"),
            ape_q.alias("ape_q"),
        )

    scored = _scored("f_naive", "naive").unionAll(
        _scored("f_snaive", "seasonal_naive")
    )
    return scored.groupBy("model").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.sum("abs_err").cast("double") / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("mae_cents"),
        F.round(
            F.sum("ape_q").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(float(_BT_SCALE))
            * F.lit(100.0),
            6,
        ).alias("mape_pct"),
    )


# ---------------------------------------------------------------------------
# CUPED-adjusted A/B readout
# ---------------------------------------------------------------------------
#
# Variance reduction for experiments (Deng et al. 2013, CUPED): adjust
# the experiment metric with a pre-period covariate,
# y_adj = y − θ(x − x̄), θ = cov(x,y)/var(x). Pre-period = the first
# 15 days of the event stream (data-derived, deterministic); covariate
# x = pre-period event count per user, metric y = post-period purchase
# count; variants are the md5 A/B buckets of the z-test query. θ, the
# adjusted means, and the variance-reduction factor (= ρ²ₓᵧ) are all
# assembled from EXACT integer moment sums in one fixed double tree —
# no per-row double anywhere.

CUPED_ORACLE = """
WITH cutoff AS (
  SELECT MIN(ts) + INTERVAL 15 DAYS AS c FROM events
),
per_user AS (
  SELECT user_id,
         SUM(CASE WHEN ts < (SELECT c FROM cutoff) THEN 1 ELSE 0 END)
           ::HUGEINT AS x,
         SUM(CASE WHEN ts >= (SELECT c FROM cutoff)
                   AND event_type = 'purchase' THEN 1 ELSE 0 END)
           ::HUGEINT AS y
  FROM events GROUP BY user_id
),
bucketed AS (
  SELECT ((ascii(substring(md5(CAST(user_id AS STRING)), 1, 1))
           - (CASE WHEN ascii(substring(md5(CAST(user_id AS STRING)), 1, 1))
                   >= 97 THEN 87 ELSE 48 END)) % 2) AS variant,
         x, y
  FROM per_user
),
pooled AS (
  SELECT COUNT(*)::HUGEINT AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM bucketed
),
per_variant AS (
  SELECT variant, COUNT(*)::HUGEINT AS nv, SUM(x) AS svx, SUM(y) AS svy
  FROM bucketed GROUP BY variant
)
SELECT v.variant::BIGINT AS variant,
       v.nv::BIGINT AS n_users,
       ROUND(CAST(v.svy AS DOUBLE) / CAST(v.nv AS DOUBLE), 6) AS mean_raw,
       ROUND(CAST(v.svy AS DOUBLE) / CAST(v.nv AS DOUBLE)
             - (CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE))
               * (CAST(v.svx AS DOUBLE) / CAST(v.nv AS DOUBLE)
                  - CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)), 6)
         AS mean_cuped,
       ROUND((CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
              * CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE))
             / (CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE)
                * CAST(p.n * p.syy - p.sy * p.sy AS DOUBLE)), 6)
         AS variance_reduction
FROM per_variant v CROSS JOIN pooled p
"""


@register("ab_test_cuped_adjusted", CUPED_ORACLE)
def ab_test_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted per-variant conversion means + the variance
    reduction factor: (variant, n_users, mean_raw, mean_cuped,
    variance_reduction)."""
    events = load_table(spark, sf_dir, "events")
    cutoff = events.agg(
        (F.min("ts") + F.expr("INTERVAL 15 DAYS")).alias("c")
    )
    per_user = (
        events.crossJoin(F.broadcast(cutoff))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < F.col("c"), 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("x"),
            F.sum(
                F.when(
                    (F.col("ts") >= F.col("c"))
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            )
            .cast("decimal(38,0)")
            .alias("y"),
        )
    )
    # single-hex-char parity bucket — the identical expression text the
    # oracle uses (NOT the 4-char md5_uniform16 decode: its mod-2 is
    # the LAST char's parity, a different split)
    first_hex = (
        "(ascii(substring(md5(CAST(user_id AS STRING)), 1, 1)) - "
        "(CASE WHEN ascii(substring(md5(CAST(user_id AS STRING)), 1, 1)) "
        ">= 97 THEN 87 ELSE 48 END)) % 2"
    )
    bucketed = per_user.select(
        F.expr(first_hex).alias("variant"), "x", "y"
    )
    pooled = bucketed.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    per_variant = bucketed.groupBy("variant").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nv"),
        F.sum("x").alias("svx"),
        F.sum("y").alias("svy"),
    )
    theta_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    theta_den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    mean_raw = F.col("svy").cast("double") / F.col("nv").cast("double")
    mean_x = F.col("svx").cast("double") / F.col("nv").cast("double")
    mean_x_all = F.col("sx").cast("double") / F.col("n").cast("double")
    return per_variant.crossJoin(F.broadcast(pooled)).select(
        F.col("variant").cast("bigint").alias("variant"),
        F.col("nv").cast("bigint").alias("n_users"),
        F.round(mean_raw, 6).alias("mean_raw"),
        F.round(
            mean_raw - (theta_num / theta_den) * (mean_x - mean_x_all), 6
        ).alias("mean_cuped"),
        F.round(theta_num * theta_num / (theta_den * vy), 6).alias(
            "variance_reduction"
        ),
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test on daily revenue (r10)
# ---------------------------------------------------------------------------
#
# The non-parametric companion to the Theil–Sen slope already in
# stats3: S = Σ_{i<j} sign(c_j − c_i) over the per-priority daily
# revenue series, normal approximation with the tie correction
# (Mann 1945, Kendall 1975):
#   Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18
#   z      = (S−1)/√Var  if S>0;  (S+1)/√Var  if S<0;  0 otherwise
#
# Scale shape: the pair join runs on the DAY GRID (priority × calendar
# day — ~2.4k rows per priority at ANY corpus size, the theilsen
# boundedness argument), equi-keyed on priority with the d1<d2
# residual, so candidate volume is calendar²-bounded, never
# corpus-scale. All counting is exact integer (S, the tie sums, 18·Var
# as DECIMAL(38,0)/HUGEINT); the single double tree is the final
# (S∓1)/sqrt(Var) — both engines CAST the exact integers and apply one
# correctly-rounded sqrt, so there is no summation-order exposure.

MANN_KENDALL_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))::HUGEINT AS cents
  FROM orders GROUP BY 1, 2
),
s AS (
  SELECT a.priority,
         SUM(CASE WHEN b.cents > a.cents THEN 1
                  WHEN b.cents < a.cents THEN -1 ELSE 0 END)::HUGEINT AS s_stat
  FROM daily a JOIN daily b
    ON a.priority = b.priority AND a.day < b.day
  GROUP BY a.priority
),
n AS (
  SELECT priority, COUNT(*)::HUGEINT AS n_days FROM daily GROUP BY priority
),
ties AS (
  SELECT priority,
         COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)::HUGEINT AS tie_sum
  FROM (
    SELECT priority, cents, COUNT(*)::HUGEINT AS t
    FROM daily GROUP BY priority, cents
  ) GROUP BY priority
),
v AS (
  SELECT n.priority, n.n_days, ties.tie_sum,
         (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie_sum)
           AS var18
  FROM n JOIN ties ON n.priority = ties.priority
)
SELECT v.priority,
       v.n_days::BIGINT AS n_days,
       s.s_stat::BIGINT AS s_stat,
       ROUND(CASE WHEN s.s_stat > 0
                    THEN CAST(s.s_stat - 1 AS DOUBLE)
                         / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                  WHEN s.s_stat < 0
                    THEN CAST(s.s_stat + 1 AS DOUBLE)
                         / sqrt(CAST(v.var18 AS DOUBLE) / 18.0)
                  ELSE 0.0 END, 6) AS z_score,
       CASE WHEN s.s_stat > 0 THEN 'increasing'
            WHEN s.s_stat < 0 THEN 'decreasing'
            ELSE 'no trend' END AS trend
FROM v JOIN s ON v.priority = s.priority
"""


@register("mann_kendall_daily_trend", MANN_KENDALL_ORACLE)
def mann_kendall_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test of daily revenue per priority:
    (priority, n_days, s_stat, z_score, trend).

    r15 grid replay (guide §1.2; the SSL sufficient-statistics
    pattern): the ONLY corpus-scale work is the daily aggregate — the
    (priority, day, cents) grid is CALENDAR-bounded (~12 k rows at any
    SF; the same bound the old pair join's candidate volume relied
    on), so it is collected once and the ~29 M-per-priority sign
    comparisons, tie sums and counts replay in numpy/Python exact
    integers instead of a 145 M-row Spark join (bench-context: the
    join was ~2 s of CPU that never shrinks with cores because it is
    corpus-size-independent). The comparisons avoid subtraction
    (boolean >/<), so no difference-overflow exists at any cents
    magnitude; the single double tree — (S∓1) / sqrt(var18/18) — is
    computed with the identical casts/ops (IEEE-correctly-rounded
    either engine) and the final round(…, 6) stays in Spark.
    cents stays BIGINT (magnitude proof: one calendar cell's revenue
    reaches 9.2e18 only past ~sf5e9; ANSI makes overflow loud)."""
    import math

    import numpy as np

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c100"),
        )
        .groupBy("priority", "day")
        .agg(F.sum("c100").alias("cents"))
    )
    rows = daily.collect()
    grid: dict[str, list[tuple]] = {}
    for r in rows:
        grid.setdefault(r["priority"], []).append((r["day"], r["cents"]))
    out = []
    for priority in sorted(grid):
        cells = sorted(grid[priority])  # by day (the join's a.day < b.day)
        c = np.asarray([v for _, v in cells], dtype=np.int64)
        n = len(c)
        # S = Σ_{i<j} sign(c_j − c_i), via boolean compares (no diffs)
        gt = np.triu(c[None, :] > c[:, None], k=1).sum()
        lt = np.triu(c[None, :] < c[:, None], k=1).sum()
        s_stat = int(gt) - int(lt)
        _, counts = np.unique(c, return_counts=True)
        tie_sum = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in counts)
        var18 = n * (n - 1) * (2 * n + 5) - tie_sum  # exact Python int
        if s_stat > 0:
            z = float(s_stat - 1) / math.sqrt(float(var18) / 18.0)
            trend = "increasing"
        elif s_stat < 0:
            z = float(s_stat + 1) / math.sqrt(float(var18) / 18.0)
            trend = "decreasing"
        else:
            z, trend = 0.0, "no trend"
        out.append((priority, n, s_stat, z, trend))
    return spark.createDataFrame(
        out,
        "priority string, n_days bigint, s_stat bigint, z_raw double, "
        "trend string",
    ).select(
        "priority",
        "n_days",
        "s_stat",
        F.round("z_raw", 6).alias("z_score"),
        "trend",
    )


# ---------------------------------------------------------------------------
# Cochran–Armitage trend test (r10)
# ---------------------------------------------------------------------------
#
# Trend in a binomial proportion across ORDERED groups (Cochran 1954,
# Armitage 1955): is the return rate (l_returnflag = 'R') monotone in
# order priority (scores s = 1..5 from the priority prefix)? With
# r_i/n_i per group, R = Σr, N = Σn:
#   T' = N·Σ s_i r_i − R·Σ s_i n_i                (integer numerator)
#   V' = N·Σ n_i s_i² − (Σ s_i n_i)²              (integer variance core)
#   z  = T' / sqrt(R·(N−R)·V' / N)
# Every sum is an exact integer on the 5-cell group grid; the z
# denominator is ONE fixed double tree with identical parenthesization
# in both engines (the product exceeds 64-bit range, so it multiplies
# as doubles — correctly-rounded ops in a fixed order, no summation
# exposure). Scale shape: one join + one 5-cell aggregate.

COCHRAN_ARMITAGE_ORACLE = """
WITH cells AS (
  SELECT CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS s,
         COUNT(*)::HUGEINT AS n,
         SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)::HUGEINT
           AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
),
agg AS (
  SELECT SUM(n) AS big_n, SUM(r) AS big_r,
         SUM(s * r) AS sr, SUM(s * n) AS sn, SUM(n * s * s) AS snss
  FROM cells
)
SELECT big_n::BIGINT AS n_total,
       big_r::BIGINT AS n_returned,
       (big_n * sr - big_r * sn)::BIGINT AS t_num,
       ROUND(CAST(big_n * sr - big_r * sn AS DOUBLE)
             / sqrt(((CAST(big_r AS DOUBLE) * CAST(big_n - big_r AS DOUBLE))
                     * CAST(big_n * snss - sn * sn AS DOUBLE))
                    / CAST(big_n AS DOUBLE)), 6) AS z_score
FROM agg
"""


@register("cochran_armitage_trend", COCHRAN_ARMITAGE_ORACLE)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend of return rate across ordered priorities:
    one row (n_total, n_returned, t_num, z_score)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("s"),
    )
    cells = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("r"),
        )
    )
    agg = cells.agg(
        F.sum("n").alias("big_n"),
        F.sum("r").alias("big_r"),
        F.sum(F.col("s") * F.col("r")).alias("sr"),
        F.sum(F.col("s") * F.col("n")).alias("sn"),
        F.sum(F.col("n") * F.col("s") * F.col("s")).alias("snss"),
    )
    t_num = F.col("big_n") * F.col("sr") - F.col("big_r") * F.col("sn")
    vcore = F.col("big_n") * F.col("snss") - F.col("sn") * F.col("sn")
    denom = F.sqrt(
        (
            F.col("big_r").cast("double")
            * (F.col("big_n") - F.col("big_r")).cast("double")
            * vcore.cast("double")
        )
        / F.col("big_n").cast("double")
    )
    return agg.select(
        F.col("big_n").cast("bigint").alias("n_total"),
        F.col("big_r").cast("bigint").alias("n_returned"),
        t_num.cast("bigint").alias("t_num"),
        F.round(t_num.cast("double") / denom, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR over the per-nation conversion z-tests (r10)
# ---------------------------------------------------------------------------
#
# Multiple-testing control for fleet-style dashboards (Benjamini &
# Hochberg 1995): run one two-proportion z-test per user cohort
# (cohort = user_id % 25, a stand-in nation key; tested metric = the
# cohort's share of PURCHASE events vs the complement — event-level,
# ~0.2, so the pooled variance never degenerates at small SFs the way
# a per-user conversion flag does), convert to two-sided p-values, and
# mark BH discoveries at FDR q = 0.10 — reject H(1..k*) where
# k* = max{k: p(k) ≤ q·k/m}.
#
# Determinism: the z and p values are fixed double trees from exact
# integer counts (erfc is libm, so p-values round to 9 dp on BOTH
# sides BEFORE the BH ranking, making the rank compare
# engine-identical); the BH threshold compare is integer-exact
# (10·m·p_q ≤ k where p_q is the 9-dp-quantized integer). The whole
# battery is grid-sized (≤ 25 nations) after one user-keyed aggregate.

BH_FDR_Q_NUM, BH_FDR_Q_DEN = 1, 10  # q = 0.1
_BH_P_SCALE = 1_000_000_000  # 9-dp p-value quantization


def _p_two_sided_sql(z: str) -> str:
    """Two-sided normal p-value as ONE SQL expression string used
    VERBATIM by both engines (neither ships erf/erfc as SQL builtins):
    Abramowitz & Stegun 26.2.17, |error| < 7.5e-8 — far inside the
    9-dp quantization. The text being identical pins the evaluation
    tree, and exp/sqrt resolve to the same host libm, the established
    ln()/round precedent of this repo."""
    t = f"(1.0 / (1.0 + 0.2316419 * abs({z})))"
    poly = (
        f"({t} * (0.319381530 + {t} * (-0.356563782 + {t} * "
        f"(1.781477937 + {t} * (-1.821255978 + {t} * 1.330274429)))))"
    )
    phi = f"(exp(-(abs({z}) * abs({z})) / 2.0) / sqrt(2.0 * pi()))"
    return f"(2.0 * {phi} * {poly})"


def _bh_oracle() -> str:
    return f"""
WITH cells AS (
  SELECT (CAST(user_id AS BIGINT) % 25) AS nation,
         COUNT(*)::HUGEINT AS n1,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::HUGEINT
           AS x1
  FROM events GROUP BY 1
),
tot AS (SELECT SUM(n1) AS n_all, SUM(x1) AS x_all FROM cells),
tests AS (
  SELECT c.nation, c.n1::BIGINT AS n1, c.x1::BIGINT AS x1,
         (t.n_all - c.n1)::BIGINT AS n2, (t.x_all - c.x1)::BIGINT AS x2
  FROM cells c CROSS JOIN tot t
),
z AS (
  SELECT nation, n1, x1,
         (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
           / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                  * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                  * (1.0 / n1 + 1.0 / n2)) AS zv
  FROM tests
),
p AS (
  SELECT nation, n1, x1,
         ROUND(zv, 6) AS z_score,
         CAST(ROUND({_p_two_sided_sql('zv')} * {_BH_P_SCALE}, 0)
              AS BIGINT) AS p_q
  FROM z
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY p_q, nation) AS k,
         COUNT(*) OVER () AS m
  FROM p
),
cutoff AS (
  SELECT COALESCE(MAX(CASE WHEN CAST(p_q AS HUGEINT) * m
                                * {BH_FDR_Q_DEN}
                             <= CAST(k AS HUGEINT) * {BH_FDR_Q_NUM}
                                * {_BH_P_SCALE}
                           THEN k END), 0) AS k_star
  FROM ranked
)
SELECT r.nation::BIGINT AS nation, r.n1 AS n_events, r.x1 AS n_purchases,
       r.z_score,
       ROUND(CAST(r.p_q AS DOUBLE) / {_BH_P_SCALE}, 9) AS p_value,
       (r.k <= c.k_star) AS bh_discovery
FROM ranked r CROSS JOIN cutoff c
"""


@register("bh_fdr_nation_conversion", _bh_oracle())
def bh_fdr_nation_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR (q=0.1) over per-cohort two-proportion
    purchase-share z-tests: (nation, n_events, n_purchases, z_score,
    p_value, bh_discovery)."""
    events = load_table(spark, sf_dir, "events")
    cells = (
        events.select(
            (F.col("user_id").cast("bigint") % 25).alias("nation"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("is_p"),
        )
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n1"),
            F.sum("is_p").cast("decimal(38,0)").alias("x1"),
        )
    )
    tot = cells.agg(
        F.sum("n1").alias("n_all"), F.sum("x1").alias("x_all")
    )
    tests = cells.crossJoin(F.broadcast(tot)).select(
        "nation",
        F.col("n1").cast("bigint").alias("n1"),
        F.col("x1").cast("bigint").alias("x1"),
        (F.col("n_all") - F.col("n1")).cast("bigint").alias("n2"),
        (F.col("x_all") - F.col("x1")).cast("bigint").alias("x2"),
    )
    pool = (F.col("x1") + F.col("x2")).cast("double") / (
        F.col("n1") + F.col("n2")
    ).cast("double")
    zv = (
        F.col("x1").cast("double") / F.col("n1").cast("double")
        - F.col("x2").cast("double") / F.col("n2").cast("double")
    ) / F.sqrt(
        pool
        * (1.0 - pool)
        * (
            1.0 / F.col("n1").cast("double")
            + 1.0 / F.col("n2").cast("double")
        )
    )
    # two-sided normal p via erfc, quantized to an exact 9-dp integer
    # BEFORE ranking so the BH order is engine-identical
    p_q = F.round(
        F.expr(_p_two_sided_sql("__zv")) * _BH_P_SCALE, 0
    ).cast("bigint")
    p = tests.withColumn("__zv", zv).select(
        "nation",
        F.col("n1").alias("n_users_i"),
        F.col("x1").alias("n_conv_i"),
        F.round("__zv", 6).alias("z_score"),
        p_q.alias("p_q"),
    )
    wk = Window.orderBy("p_q", "nation")
    ranked = p.withColumn("k", F.row_number().over(wk)).withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy())
    )
    passes = (
        F.col("p_q").cast("decimal(38,0)") * F.col("m") * BH_FDR_Q_DEN
        <= F.col("k").cast("decimal(38,0)") * BH_FDR_Q_NUM * _BH_P_SCALE
    )
    cutoff = ranked.agg(
        F.coalesce(F.max(F.when(passes, F.col("k"))), F.lit(0)).alias(
            "k_star"
        )
    )
    return ranked.crossJoin(F.broadcast(cutoff)).select(
        F.col("nation").cast("bigint").alias("nation"),
        F.col("n_users_i").alias("n_events"),
        F.col("n_conv_i").alias("n_purchases"),
        "z_score",
        F.round(F.col("p_q").cast("double") / _BH_P_SCALE, 9).alias(
            "p_value"
        ),
        (F.col("k") <= F.col("k_star")).alias("bh_discovery"),
    )

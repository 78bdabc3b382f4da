"""Statistical-insight battery #7: partial autocorrelation (PACF).

``pacf_daily_revenue`` completes the Box-Jenkins identification pair:
``acf_daily_revenue`` gives the MA signature, this gives the AR
signature — PACF at lag k is the Durbin-Levinson coefficient φ_kk of
the order-k autoregression, computed from the sample autocorrelations
r_1..r_K by the standard recursion (Durbin 1960):

    φ_kk = (r_k − Σ_{j<k} φ_{k-1,j} r_{k-j}) / (1 − Σ_{j<k} φ_{k-1,j} r_j)
    φ_kj = φ_{k-1,j} − φ_kk φ_{k-1,k-j}

Arithmetic parity: the r_k assemble from exact integer moments by the
acf_daily_revenue fixed tree (bit-equal cross-engine pre-round), and
the recursion over K=5 levels is UNROLLED into a chain of column
definitions whose SQL text is GENERATED ONCE (`_dl_stages`) and
evaluated verbatim by both engines (the A&S normal-tail snippet
precedent) — Spark via selectExpr, DuckDB via chained CTEs — so every
intermediate φ is the same double on both sides. Only the final
φ_kk values are rounded.

Scale shape: one fact-scale groupBy to the calendar-bounded day grid;
the lag self-join, pivot, and recursion all run on ≤ K+1-row relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

_PACF_K = 5


def _dl_stages() -> list[tuple[str, str]]:
    """(alias, portable SQL expr) pairs for the unrolled recursion,
    in dependency order. References columns r1..rK and earlier
    aliases p{level}_{j}."""
    stages: list[tuple[str, str]] = [("p1_1", "r1")]
    for k in range(2, _PACF_K + 1):
        num = f"r{k} - (" + " + ".join(
            f"p{k - 1}_{j} * r{k - j}" for j in range(1, k)
        ) + ")"
        den = "1 - (" + " + ".join(
            f"p{k - 1}_{j} * r{j}" for j in range(1, k)
        ) + ")"
        stages.append((f"p{k}_{k}", f"({num}) / ({den})"))
        for j in range(1, k):
            stages.append(
                (f"p{k}_{j}", f"p{k - 1}_{j} - p{k}_{k} * p{k - 1}_{k - j}")
            )
    return stages


def _acf_pivot_sql() -> str:
    """CTE text computing the UNROUNDED r_1..r_K row (the
    acf_daily_revenue moment tree at consecutive lags)."""
    lags = ", ".join(f"({k})" for k in range(1, _PACF_K + 1))
    rs = ", ".join(
        f"MAX(CASE WHEN lag = {k} THEN acf END) AS r{k}"
        for k in range(1, _PACF_K + 1)
    )
    return f"""
daily AS (
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
  JOIN (VALUES {lags}) AS l(lag) ON TRUE
  JOIN daily b ON b.day = a.day + CAST(l.lag AS INT)
  GROUP BY l.lag
),
acfs AS (
  SELECT CAST(g.lag AS BIGINT) AS lag,
         (CAST(g.sxy AS DOUBLE)
          - (CAST(t.s AS DOUBLE) / t.n)
            * (CAST(g.s_head AS DOUBLE) + CAST(g.s_tail AS DOUBLE))
          + g.n_pairs * (CAST(t.s AS DOUBLE) / t.n)
                      * (CAST(t.s AS DOUBLE) / t.n))
         / (CAST(t.sxx AS DOUBLE)
            - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n) AS acf
  FROM lagged g CROSS JOIN tot t
),
base AS (SELECT {rs} FROM acfs)"""


def _pacf_oracle() -> str:
    ctes = [_acf_pivot_sql()]
    prev = "base"
    for i, (alias, expr) in enumerate(_dl_stages()):
        name = f"s{i}"
        ctes.append(f"{name} AS (SELECT *, ({expr}) AS {alias} FROM {prev})")
        prev = name
    unions = "\nUNION ALL ".join(
        f"SELECT {k}::BIGINT AS lag, ROUND(p{k}_{k}, 6) AS pacf FROM {prev}"
        for k in range(1, _PACF_K + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


@register("pacf_daily_revenue", _pacf_oracle())
def pacf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PACF of daily revenue at lags 1..{_PACF_K} via the unrolled
    Durbin-Levinson recursion: (lag, pacf)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    dec = "decimal(38,0)"
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("s"),
        F.sum(F.col("cents").cast(dec) * F.col("cents")).alias("sxx"),
    )
    lags = spark.range(1, _PACF_K + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select(F.col("day"), F.col("cents").alias("c_head"))
    b = daily.select(
        F.col("day").alias("day_b"), F.col("cents").alias("c_tail")
    )
    lagged = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("day_b") == F.expr("date_add(day, lag)"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("c_head").cast(dec) * F.col("c_tail")).alias("sxy"),
            F.sum(F.col("c_head").cast(dec)).alias("s_head"),
            F.sum(F.col("c_tail").cast(dec)).alias("s_tail"),
        )
    )
    mean = F.col("s").cast("double") / F.col("n")
    acf = (
        F.col("sxy").cast("double")
        - mean * (F.col("s_head").cast("double") + F.col("s_tail").cast("double"))
        + F.col("n_pairs") * mean * mean
    ) / (
        F.col("sxx").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    )
    acfs = lagged.crossJoin(F.broadcast(tot)).select(
        F.col("lag").cast("bigint").alias("lag"), acf.alias("acf")
    )
    base = acfs.groupBy().agg(
        *[
            F.max(F.when(F.col("lag") == k, F.col("acf"))).alias(f"r{k}")
            for k in range(1, _PACF_K + 1)
        ]
    )
    df = base
    for alias, expr in _dl_stages():
        df = df.selectExpr("*", f"({expr}) AS {alias}")
    parts = [
        df.selectExpr(
            f"CAST({k} AS BIGINT) AS lag", f"ROUND(p{k}_{k}, 6) AS pacf"
        )
        for k in range(1, _PACF_K + 1)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# Lorenz decile shares of customer revenue
# ---------------------------------------------------------------------------
#
# The distributional readout behind gini_revenue_concentration's
# scalar: rank customers by lifetime revenue, split into deciles, and
# report each decile's revenue share plus the cumulative (Lorenz)
# curve — the "top 10% hold X%" table. Everything is exact integer:
# ranks come from the counted VALUE grid (distinct revenue cents →
# cumulative counts), deciles by integer floor division on the
# cumulative position (value-tied customers share a decile — the
# deterministic convention both engines compute identically), shares
# quantized by exact integer division.
#
# 100 TB shape: one fact-scale groupBy to per-customer revenue, one
# groupBy to the distinct-value grid, then windows over the NARROW
# (cents, cnt) relation — never a per-row global row_number (a global
# rank window is a single-partition sort; the value-grid cumsum is
# the equidepth/conformal-rank discipline).

LORENZ_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))::HUGEINT AS cents
  FROM orders GROUP BY o_custkey
),
grid AS (SELECT cents, COUNT(*)::HUGEINT AS cnt FROM cust GROUP BY cents),
tot AS (
  SELECT SUM(cnt)::HUGEINT AS n, SUM(cents * cnt)::HUGEINT AS total
  FROM grid
),
cum AS (
  SELECT cents, cnt,
         SUM(cnt) OVER (ORDER BY cents) AS cum_n
  FROM grid
),
binned AS (
  SELECT ((c.cum_n - 1) * 10) // t.n + 1 AS decile,
         c.cnt, c.cents * c.cnt AS rev
  FROM cum c CROSS JOIN tot t
),
per AS (
  SELECT decile,
         SUM(cnt)::HUGEINT AS n_customers,
         SUM(rev)::HUGEINT AS revenue_cents
  FROM binned GROUP BY decile
)
SELECT CAST(p.decile AS BIGINT) AS decile,
       p.n_customers::BIGINT AS n_customers,
       p.revenue_cents::BIGINT AS revenue_cents,
       CAST((p.revenue_cents * 1000000) // t.total AS BIGINT) AS share_ppm,
       CAST((SUM(p.revenue_cents) OVER (ORDER BY p.decile) * 1000000)
            // t.total AS BIGINT) AS cum_share_ppm
FROM per p CROSS JOIN tot t
"""


@register("revenue_lorenz_deciles", LORENZ_ORACLE)
def revenue_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz decile table of customer lifetime revenue: (decile,
    n_customers, revenue_cents, share_ppm, cum_share_ppm) — exact
    integers throughout."""
    orders = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
        .cast(dec)
        .alias("cents")
    )
    grid = cust.groupBy("cents").agg(F.count(F.lit(1)).cast(dec).alias("cnt"))
    tot = grid.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cents") * F.col("cnt")).alias("total"),
    )
    cum = grid.select(
        "cents",
        "cnt",
        F.sum("cnt").over(Window.orderBy("cents")).alias("cum_n"),
    )
    binned = cum.crossJoin(F.broadcast(tot)).select(
        F.expr("CAST(((cum_n - 1) * 10) div n AS BIGINT) + 1").alias(
            "decile"
        ),
        "cnt",
        (F.col("cents") * F.col("cnt")).alias("rev"),
        "total",
    )
    per = binned.groupBy("decile", "total").agg(
        F.sum("cnt").alias("n_customers"),
        F.sum("rev").alias("revenue_cents"),
    )

    def _floordiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast(dec)

    wcum = Window.orderBy("decile")
    return per.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
        _floordiv(
            (F.col("revenue_cents") * F.lit(1_000_000)).cast(dec),
            F.col("total"),
        )
        .cast("bigint")
        .alias("share_ppm"),
        _floordiv(
            (
                F.sum("revenue_cents").over(wcum) * F.lit(1_000_000)
            ).cast(dec),
            F.col("total"),
        )
        .cast("bigint")
        .alias("cum_share_ppm"),
    )


# ---------------------------------------------------------------------------
# Wilson score intervals for conversion rates (r12)
# ---------------------------------------------------------------------------
#
# The interval readout next to the two-proportion z-test: per market
# segment, the share of customers who ever placed an URGENT order,
# with the Wilson (1927) 95% score interval — the small-n-safe
# interval a dashboards tier ships (normal-approximation intervals go
# negative near 0).
#
# Arithmetic parity: successes/trials are exact integers; the interval
# uses only +, −, ×, ÷, sqrt over doubles derived from those integers
# and the literal z = 1.96 — every op IEEE correctly rounded, so the
# pre-round doubles are bit-identical cross-engine (the
# domain_temperature_sample pattern; no pow(), no ln()). DuckDB
# parses bare decimals as DECIMAL, so the oracle CASTs every literal
# to DOUBLE (verify-skill rule).

_WILSON_Z = "CAST(1.96 AS DOUBLE)"

WILSON_ORACLE = f"""
WITH conv AS (
  SELECT c.c_mktsegment,
         COUNT(*)::BIGINT AS n_trials,
         SUM(CASE WHEN EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderpriority = '1-URGENT')
             THEN 1 ELSE 0 END)::BIGINT AS n_success
  FROM customer c GROUP BY c.c_mktsegment
),
w AS (
  SELECT c_mktsegment, n_trials, n_success,
         CAST(n_success AS DOUBLE) / CAST(n_trials AS DOUBLE) AS p,
         {_WILSON_Z} * {_WILSON_Z} / CAST(n_trials AS DOUBLE) AS zz
  FROM conv
)
SELECT c_mktsegment, n_trials, n_success,
       ROUND(p, 6) AS p_hat,
       ROUND((p + zz / CAST(2 AS DOUBLE)
              - {_WILSON_Z} * sqrt(p * (CAST(1 AS DOUBLE) - p)
                                   / CAST(n_trials AS DOUBLE)
                                   + zz * zz / CAST(4 AS DOUBLE)
                                     / ({_WILSON_Z} * {_WILSON_Z})))
             / (CAST(1 AS DOUBLE) + zz), 6) AS wilson_lo,
       ROUND((p + zz / CAST(2 AS DOUBLE)
              + {_WILSON_Z} * sqrt(p * (CAST(1 AS DOUBLE) - p)
                                   / CAST(n_trials AS DOUBLE)
                                   + zz * zz / CAST(4 AS DOUBLE)
                                     / ({_WILSON_Z} * {_WILSON_Z})))
             / (CAST(1 AS DOUBLE) + zz), 6) AS wilson_hi
FROM w
"""


@register("conversion_wilson_bounds", WILSON_ORACLE)
def conversion_wilson_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment urgent-order conversion with Wilson 95% score
    bounds: (c_mktsegment, n_trials, n_success, p_hat, wilson_lo,
    wilson_hi). One semi-join-shaped conditional aggregate; the
    interval math runs on the 5-row segment grid."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    flagged = cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left"
    ).select(
        "c_mktsegment",
        F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0).alias("s"),
    )
    conv = flagged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trials"),
        F.sum("s").cast("bigint").alias("n_success"),
    )
    z = F.lit(1.96)
    n = F.col("n_trials").cast("double")
    p = F.col("n_success").cast("double") / n
    zz = z * z / n
    rad = z * F.sqrt(p * (F.lit(1.0) - p) / n + zz * zz / F.lit(4.0) / (z * z))
    return conv.select(
        "c_mktsegment",
        "n_trials",
        "n_success",
        F.round(p, 6).alias("p_hat"),
        F.round((p + zz / F.lit(2.0) - rad) / (F.lit(1.0) + zz), 6).alias(
            "wilson_lo"
        ),
        F.round((p + zz / F.lit(2.0) + rad) / (F.lit(1.0) + zz), 6).alias(
            "wilson_hi"
        ),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily revenue (r12)
# ---------------------------------------------------------------------------
#
# The randomness screen next to CUSUM and Mann-Kendall: is the daily
# revenue's above/below-median sign sequence random, or does it carry
# momentum (fewer runs) / alternation (more runs)? Classic runs test:
# R = observed runs, mu = 1 + 2·n1·n2/n, sigma² =
# 2n1n2(2n1n2 − n)/(n²(n−1)), z = (R − mu)/sigma.
#
# Determinism: the median is POSITIONAL (value at rank (n+1)//2 under
# the (value, day) total order — selection, not arithmetic);
# equal-to-median days drop (the textbook treatment); runs come from
# one LAG over the bounded day grid; mu/sigma are built from exact
# integers through correctly-rounded double ops only (one sqrt), so
# round-6 is ULP-safe.

RUNS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY day
),
ranked AS (
  SELECT day, rev_c,
         ROW_NUMBER() OVER (ORDER BY rev_c, day) AS rk,
         COUNT(*) OVER () AS n
  FROM daily
),
med AS (SELECT rev_c AS med_c FROM ranked WHERE rk = (n + 1) // 2),
signs AS (
  SELECT day, CASE WHEN rev_c > med_c THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN med
  WHERE rev_c <> med_c
),
runs AS (
  SELECT s,
         CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
               OR LAG(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS brk
  FROM signs
),
agg AS (
  SELECT COUNT(*)::BIGINT AS n,
         SUM(s)::BIGINT AS n1,
         (COUNT(*) - SUM(s))::BIGINT AS n2,
         SUM(brk)::BIGINT AS n_runs
  FROM runs
)
SELECT n, n1, n2, n_runs,
       ROUND((CAST(n_runs AS DOUBLE)
              - (CAST(1 AS DOUBLE)
                 + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n AS DOUBLE)))
             / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                    * CAST(2 * n1 * n2 - n AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * CAST(n - 1 AS DOUBLE))), 6) AS z_runs
FROM agg
"""


@register("runs_test_daily_revenue", RUNS_ORACLE)
def runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test over the daily-revenue sign sequence:
    one row (n, n1, n2, n_runs, z_runs). Day grid is calendar-bounded;
    the only fact-scale work is the daily integer-cents aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev_c"
        )
    )
    w = Window.orderBy("rev_c", "day")
    ranked = daily.select(
        "rev_c",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("n"),
    )
    med = ranked.where(
        F.col("rk") == (F.col("n") + 1 - F.pmod(F.col("n") + 1, 2)) / 2
    ).select(F.col("rev_c").alias("med_c"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("rev_c") != F.col("med_c"))
        .select(
            "day",
            F.when(F.col("rev_c") > F.col("med_c"), 1).otherwise(0).alias("s"),
        )
    )
    lagw = Window.orderBy("day")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(lagw).isNull()
            | (F.lag("s").over(lagw) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    agg = runs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("n2"),
        F.sum("brk").cast("bigint").alias("n_runs"),
    )
    n = F.col("n").cast("double")
    tnn = (F.lit(2) * F.col("n1") * F.col("n2")).cast("double")
    mu = F.lit(1.0) + tnn / n
    sigma = F.sqrt(
        tnn
        * (F.lit(2) * F.col("n1") * F.col("n2") - F.col("n")).cast("double")
        / (n * n * (n - F.lit(1.0)))
    )
    return agg.select(
        "n",
        "n1",
        "n2",
        "n_runs",
        F.round((F.col("n_runs").cast("double") - mu) / sigma, 6).alias(
            "z_runs"
        ),
    )


# ---------------------------------------------------------------------------
# Mutual-information feature ranking (r13)
# ---------------------------------------------------------------------------
#
# MI(X; Y) = Σ_xy (c_xy/n)·ln(n·c_xy/(c_x·c_y)) — the view-selection
# statistic behind co-training feature splits (which candidate feature
# carries label signal; the Blum–Mitchell split in
# ssl_cotrain_two_round_feature_split picks views by exactly this kind
# of ranking) and the standard feature-selection screen for a
# training-data pipeline. Candidates: f1=o_orderpriority (5),
# f2=month (12), f3=c_mktsegment (5) against Y=o_orderstatus (3).
#
# Arithmetic parity: every count is an exact integer; each cell's
# ln(n·c_xy/(c_x·c_y)) is ONE fixed libm expression of exact-integer
# inputs (identical double on both engines — the PMI precedent), and
# instead of a cross-cell DOUBLE sum (summation-order ULP exposure)
# each cell's contribution is FLOOR-quantized to an integer
# (c_xy·ln(·)·10^6 ≤ 2·10^12 at sf1 — BIGINT-safe) so the per-feature
# sum is an order-free exact integer; ONE final division by n·10^6,
# round 6. FLOOR (toward −inf, both engines) handles negative PMI
# cells identically.
#
# 100 TB shape: three fact-scale groupBys to ≤36-cell grids; the
# marginal joins and the quantized sum run on the bounded grid.

_MI_SCALE = 1_000_000


def _mi_oracle() -> str:
    feats = [("priority", "CAST(f1 AS VARCHAR)"), ("month", "CAST(f2 AS VARCHAR)"),
             ("segment", "CAST(f3 AS VARCHAR)")]
    cells = " UNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr} AS x, y, COUNT(*)::BIGINT AS c_xy "
        f"FROM base GROUP BY 2, 3"
        for name, expr in feats
    )
    return f"""
WITH base AS (
  SELECT o_orderpriority AS f1,
         EXTRACT(month FROM o_orderdate)::BIGINT AS f2,
         c_mktsegment AS f3,
         o_orderstatus AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
),
tot AS (SELECT COUNT(*)::BIGINT AS n FROM base),
cells AS ({cells}),
mx AS (SELECT feature, x, SUM(c_xy)::BIGINT AS c_x FROM cells GROUP BY 1, 2),
my AS (SELECT feature, y, SUM(c_xy)::BIGINT AS c_y FROM cells GROUP BY 1, 2),
q AS (
  SELECT c.feature,
         CAST(FLOOR(c.c_xy * ln(CAST(t.n AS DOUBLE) * c.c_xy
                                / (CAST(mx.c_x AS DOUBLE) * my.c_y))
                    * {_MI_SCALE}) AS BIGINT) AS term_q
  FROM cells c
  JOIN mx ON c.feature = mx.feature AND c.x = mx.x
  JOIN my ON c.feature = my.feature AND c.y = my.y
  CROSS JOIN tot t
)
SELECT q.feature,
       COUNT(*)::BIGINT AS n_cells,
       MAX(t.n) AS n,
       SUM(q.term_q)::BIGINT AS mi_q,
       ROUND(CAST(SUM(q.term_q) AS DOUBLE) / (MAX(t.n) * {_MI_SCALE}.0), 6)
         AS mi_nats
FROM q CROSS JOIN tot t
GROUP BY q.feature
"""


@register("feature_mi_ranking", _mi_oracle())
def feature_mi_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information of each candidate feature with the order
    status: (feature, n_cells, n, mi_q, mi_nats) — exact-integer cell
    counts, floor-quantized per-cell contributions (order-free sum),
    one final division. The co-training view-selection statistic."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select(
        F.col("o_orderpriority").alias("f1"),
        F.month("o_orderdate").cast("bigint").alias("f2"),
        F.col("c_mktsegment").alias("f3"),
        F.col("o_orderstatus").alias("y"),
    )
    from tfm_semisup_spark.operators.lineage import truncate

    base = truncate(base, eager=True)
    # the corpus total folds in RELATIONALLY (broadcast 1-row
    # aggregate, the pca_power_iteration/logreg pattern) — no eager
    # count() action at query-build time (r13 review)
    tot = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    feats = [
        ("priority", F.col("f1").cast("string")),
        ("month", F.col("f2").cast("string")),
        ("segment", F.col("f3").cast("string")),
    ]
    cells = None
    for name, expr in feats:
        c = base.groupBy(expr.alias("x"), "y").agg(
            F.count(F.lit(1)).cast("bigint").alias("c_xy")
        ).select(F.lit(name).alias("feature"), "x", "y", "c_xy")
        cells = c if cells is None else cells.unionByName(c)
    mx = cells.groupBy("feature", "x").agg(
        F.sum("c_xy").cast("bigint").alias("c_x")
    )
    my = cells.groupBy("feature", "y").agg(
        F.sum("c_xy").cast("bigint").alias("c_y")
    )
    term = F.floor(
        F.col("c_xy")
        * F.log(
            F.col("n").cast("double")
            * F.col("c_xy")
            / (F.col("c_x").cast("double") * F.col("c_y"))
        )
        * F.lit(_MI_SCALE)
    ).cast("bigint")
    return (
        cells.join(F.broadcast(mx), ["feature", "x"])
        .join(F.broadcast(my), ["feature", "y"])
        .crossJoin(F.broadcast(tot))
        .select("feature", "n", term.alias("term_q"))
        .groupBy("feature")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.max("n").cast("bigint").alias("n"),
            F.sum("term_q").cast("bigint").alias("mi_q"),
            F.round(
                F.sum("term_q").cast("double")
                / (F.max("n").cast("double") * F.lit(float(_MI_SCALE))),
                6,
            ).alias("mi_nats"),
        )
        .select("feature", "n_cells", "n", "mi_q", "mi_nats")
    )

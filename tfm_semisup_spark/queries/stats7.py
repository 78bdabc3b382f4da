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

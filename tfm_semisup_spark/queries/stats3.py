"""Statistical-insight battery #3: concentration and robust-trend
statistics over the warehouse tables.

Two more profiling operators (extension surface alongside
``relational7.py`` / ``stats2.py``):

- ``gini_revenue_concentration``: per-segment Gini coefficient of
  customer revenue via a 100-bin Lorenz curve — the inequality /
  concentration audit (whale-customer risk, data-skew health). The
  EXACT rank-based Gini needs a global value sort — the banned
  unpartitioned-window shape at 100 TB — so this is the binned lower
  bound, the same re-expression ``ks_price_by_returnflag`` uses for
  the KS distance: windows only ever run over the bounded
  segment×100-bin grid.
- ``theilsen_daily_revenue_slope``: banded Theil–Sen estimator of the
  daily-revenue trend per order priority — median of pairwise slopes
  over day pairs at most _TS_MAX_GAP days apart. The robust
  (breakdown-point 29%) alternative to ``per_nation_price_trend_ols``;
  banding bounds the pair count at |days|×gap (calendar-bounded, i.e.
  data-scale-FREE) and is itself a standard windowed-Theil–Sen
  variant for local trends.

Spark-first / 100 TB shape:
- the only fact-scale shuffles are the initial integer-cents
  aggregates (customer revenue; (priority, day) revenue). Everything
  downstream is grid-bounded: 100 bins × |segments|, |days| × gap
  pairs.
- the Theil–Sen band is generated as an EXPLODE of gap 1.._TS_MAX_GAP
  joined back equi on (priority, day+gap) — an equi-join that produces
  exactly the band, instead of the per-key cartesian a range-predicate
  join would build and filter (29M intermediates vs 1M pairs at
  sf0.01).
- the slope median is a positional pick over a per-priority sort
  window (row_number + the two middle ranks), NOT the ``percentile``
  UDAF — the UDAF serializes its full value→count buffer through
  partial/merge (measured ~4s on 1.06M slopes at sf0.1; the window
  form halves the median leg). The per-priority sort is in-task over
  the calendar-bounded band — bounded at any corpus scale.

Arithmetic parity:
- money flows as integer cents (FLOOR(price*100) BIGINT) end to end;
- Lorenz partials n_i·(2·V_i − v_i) are exact integers summed as
  DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — zero summation-order
  noise; the single double division happens once per segment on
  bit-identical operands (int→double conversion and double multiply
  are correctly rounded in IEEE-754);
- each pairwise slope is ONE correctly-rounded division of integer
  operands, so both engines sort identical double multisets and the
  (even-count) median midpoint average is bit-identical; round 6 on
  both sides defends the residual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

_GINI_BINS = 100

GINI_ORACLE = f"""
WITH cust_rev AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
mx AS (SELECT segment, MAX(cents) AS mx_cents FROM cust_rev GROUP BY segment),
binned AS (
  SELECT r.segment,
         LEAST({_GINI_BINS - 1},
               CAST(FLOOR(CAST(r.cents AS DOUBLE) * {_GINI_BINS}
                          / m.mx_cents) AS INT)) AS bin,
         COUNT(*)::BIGINT AS n, SUM(r.cents)::BIGINT AS v
  FROM cust_rev r JOIN mx m ON r.segment = m.segment
  GROUP BY 1, 2
),
lorenz AS (
  SELECT segment, n, v,
         SUM(v) OVER (PARTITION BY segment ORDER BY bin) AS cum_v
  FROM binned
)
SELECT segment,
       CAST(SUM(n) AS BIGINT) AS n_customers,
       CAST(SUM(v) AS BIGINT) AS total_cents,
       ROUND(1.0 - CAST(SUM(CAST(n AS HUGEINT) * (2 * cum_v - v)) AS DOUBLE)
                   / (CAST(SUM(n) AS DOUBLE) * CAST(SUM(v) AS DOUBLE)),
             6) AS gini
FROM lorenz
GROUP BY segment
"""


@register("gini_revenue_concentration", GINI_ORACLE)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment binned-Lorenz Gini of customer revenue:
    (segment, n_customers, total_cents, gini). Trapezoid form
    G = 1 − Σ nᵢ(Vᵢ₋₁+Vᵢ) / (N·T) over {b} equal-width bins, exact
    integer partials.""".format(b=_GINI_BINS)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    cust_rev = (
        orders.select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c100"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("c100").cast("bigint").alias("cents"))
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .select("segment", "cents")
    )
    mx = cust_rev.groupBy("segment").agg(F.max("cents").alias("mx_cents"))
    binned = (
        cust_rev.join(F.broadcast(mx), "segment")
        .withColumn(
            "bin",
            F.least(
                F.lit(_GINI_BINS - 1),
                F.floor(
                    F.col("cents").cast("double")
                    * _GINI_BINS
                    / F.col("mx_cents")
                ).cast("int"),
            ),
        )
        .groupBy("segment", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("v"),
        )
    )
    w = Window.partitionBy("segment").orderBy("bin")
    lorenz = binned.withColumn("cum_v", F.sum("v").over(w))
    partial = F.col("n").cast("decimal(38,0)") * (
        2 * F.col("cum_v") - F.col("v")
    ).cast("decimal(38,0)")
    return lorenz.groupBy("segment").agg(
        F.sum("n").cast("bigint").alias("n_customers"),
        F.sum("v").cast("bigint").alias("total_cents"),
        F.round(
            F.lit(1.0)
            - F.sum(partial).cast("double")
            / (F.sum("n").cast("double") * F.sum("v").cast("double")),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Banded Theil–Sen daily-revenue trend per order priority
# ---------------------------------------------------------------------------

_TS_MAX_GAP = 90  # days; bounds pairs at |days|×gap — calendar-bounded

THEILSEN_ORACLE = f"""
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
slopes AS (
  SELECT a.priority,
         CAST(b.cents - a.cents AS DOUBLE)
           / date_diff('day', a.day, b.day) AS slope
  FROM daily a JOIN daily b
    ON a.priority = b.priority
   AND date_diff('day', a.day, b.day) BETWEEN 1 AND {_TS_MAX_GAP}
)
SELECT d.priority,
       CAST(COUNT(DISTINCT d.day) AS BIGINT) AS n_days,
       CAST(s.n_pairs AS BIGINT) AS n_pairs,
       ROUND(s.med, 6) AS ts_slope_cents_per_day
FROM daily d
JOIN (
  SELECT priority, COUNT(*) AS n_pairs, MEDIAN(slope) AS med
  FROM slopes GROUP BY priority
) s ON d.priority = s.priority
GROUP BY d.priority, s.n_pairs, s.med
"""


@register("theilsen_daily_revenue_slope", THEILSEN_ORACLE)
def theilsen_daily_revenue_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded Theil–Sen trend of daily revenue per priority:
    (priority, n_days, n_pairs, ts_slope_cents_per_day) — the median
    pairwise slope over day pairs ≤{g} days apart.""".format(g=_TS_MAX_GAP)
    # r15 grid replay (guide §1.2; the mann_kendall/SSL
    # sufficient-statistics pattern): the only corpus-scale work is
    # the daily aggregate — the (priority, day, cents) grid is
    # CALENDAR-bounded (~12 k rows at any SF, the same bound the old
    # band join's candidate volume relied on), so it is collected once
    # and the ~1 M banded slopes + positional median replay in numpy.
    # Exactness: slope = double(c2 − c1) / g with the same
    # nearest-double cast and IEEE division either engine; the median
    # is the identical positional pick over the ascending slope sort
    # (lo + (hi − lo)·0.5, the quantile_cont form the window version
    # used — pre-round bit-equal); round(…, 6) stays in Spark. The old
    # form paid an explode×90 + equi-join + two window passes over the
    # 1.06 M-slope band — corpus-size-independent work that never
    # shrinks with data, now ~50 ms of driver numpy.
    import numpy as np

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
    grid: dict[str, list[tuple]] = {}
    for r in daily.collect():
        grid.setdefault(r["priority"], []).append((r["day"], r["cents"]))
    out = []
    for priority in sorted(grid):
        cells = sorted(grid[priority])
        ords = np.asarray([d.toordinal() for d, _ in cells], dtype=np.int64)
        cents = np.asarray([v for _, v in cells], dtype=np.int64)
        lo_ord = int(ords[0])
        pos = np.full(int(ords[-1]) - lo_ord + 1, -1, dtype=np.int64)
        pos[ords - lo_ord] = np.arange(len(ords))
        slope_parts = []
        for g in range(1, _TS_MAX_GAP + 1):
            tgt = ords - lo_ord + g
            ok = tgt < len(pos)
            j = pos[tgt[ok]]
            hit = j >= 0
            i = np.flatnonzero(ok)[hit]
            j = j[hit]
            if len(j):
                slope_parts.append(
                    (cents[j] - cents[i]).astype(np.float64) / float(g)
                )
        slopes = (
            np.concatenate(slope_parts)
            if slope_parts
            else np.empty(0, dtype=np.float64)
        )
        n_pairs = len(slopes)
        if n_pairs == 0:
            continue  # no band pairs: the oracle's inner join drops it
        slopes.sort()
        lo = slopes[(n_pairs + 1) // 2 - 1]
        hi = slopes[n_pairs // 2]
        med = float(lo) + (float(hi) - float(lo)) * 0.5
        out.append((priority, len(cells), n_pairs, med))
    return spark.createDataFrame(
        out,
        "priority string, n_days bigint, n_pairs bigint, med double",
    ).select(
        "priority",
        "n_days",
        "n_pairs",
        F.round("med", 6).alias("ts_slope_cents_per_day"),
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram construction (optimizer-statistics shape)
# ---------------------------------------------------------------------------
#
# The histogram a query optimizer builds for selectivity estimation:
# per-segment DECILE boundaries of order price. Exact per-group
# quantiles need a per-group value sort — the banned fact-scale sort —
# so this is the standard two-pass re-expression: ONE aggregate onto a
# fine fixed grid (256 equal-width bins), then CDF inversion on the
# bounded grid (the ks_price / gini binned discipline). Boundaries are
# therefore bin-resolution quantiles — exactly what production
# optimizer histograms store. All arithmetic is integers: bin ids,
# counts, cumulative counts, and the ceil(d·n/10) rank targets
# (ceil(a/b) = (a + b - 1) // b in integer form), so no value can sit
# on a cross-engine boundary.

_ED_BINS = 256

EQUIDEPTH_ORACLE = f"""
WITH priced AS (
  SELECT c.c_mktsegment AS segment,
         CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
mx AS (SELECT segment, MAX(cents) AS mx FROM priced GROUP BY segment),
binned AS (
  SELECT p.segment,
         LEAST({_ED_BINS - 1},
               CAST(FLOOR(CAST(p.cents AS DOUBLE) * {_ED_BINS} / m.mx)
                    AS INT)) AS bin,
         COUNT(*)::BIGINT AS nb
  FROM priced p JOIN mx m ON p.segment = m.segment
  GROUP BY 1, 2
),
cdf AS (
  SELECT segment, bin, nb,
         SUM(nb) OVER (PARTITION BY segment ORDER BY bin) AS cum,
         SUM(nb) OVER (PARTITION BY segment) AS n
  FROM binned
),
targets AS (
  SELECT d.d FROM UNNEST(generate_series(1, 9)) AS d(d)
)
SELECT c.segment,
       CAST(t.d AS BIGINT) AS decile,
       CAST(MIN(c.bin) AS BIGINT) AS bound_bin,
       CAST(MIN_BY(c.cum, c.bin) AS BIGINT) AS cum_at_bound
FROM cdf c JOIN targets t
  ON c.cum >= (t.d * c.n + 9) // 10
GROUP BY c.segment, t.d
"""


@register("equidepth_price_buckets", EQUIDEPTH_ORACLE)
def equidepth_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment decile boundaries of order price at {b}-bin
    resolution: (segment, decile, bound_bin, cum_at_bound) — two-pass
    CDF inversion, all-integer.""".format(b=_ED_BINS)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    priced = orders.select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).join(customer, F.col("o_custkey") == customer.c_custkey)
    mx = priced.groupBy("segment").agg(F.max("cents").alias("mx"))
    binned = (
        priced.join(F.broadcast(mx), "segment")
        .withColumn(
            "bin",
            F.least(
                F.lit(_ED_BINS - 1),
                F.floor(
                    F.col("cents").cast("double") * _ED_BINS / F.col("mx")
                ).cast("int"),
            ),
        )
        .groupBy("segment", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    )
    wcum = Window.partitionBy("segment").orderBy("bin")
    wall = Window.partitionBy("segment")
    cdf = binned.select(
        "segment",
        "bin",
        F.sum("nb").over(wcum).alias("cum"),
        F.sum("nb").over(wall).alias("n"),
    )
    targets = spark.createDataFrame([(d,) for d in range(1, 10)], "d int")
    # cum >= ceil(d*n/10) in pure integers: 10*cum >= d*n (Spark `/`
    # is double division — never divide here; the oracle's equivalent
    # integer form is cum >= (d*n + 9) // 10)
    hit = cdf.crossJoin(F.broadcast(targets)).where(
        F.col("cum") * 10 >= F.col("d") * F.col("n")
    )
    return (
        hit.groupBy("segment", F.col("d").cast("bigint").alias("decile"))
        .agg(
            F.min("bin").cast("bigint").alias("bound_bin"),
            F.min_by("cum", "bin").cast("bigint").alias("cum_at_bound"),
        )
    )

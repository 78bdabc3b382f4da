"""Behavioral/corpus analytics #3: market-basket lift, per-user
latency percentiles, and vocabulary coverage curves.

Three more staples of the analytics tier:

- ``basket_part_lift``: association-rule mining's core statistic —
  lift = P(a,b)/(P(a)·P(b)) over parts co-ordered in the same order
  (the Apriori/FP-growth readout, restricted to pair rules). Pair
  generation is bounded per order by the line count (≤ C(13,2) at any
  scale — TPC-H orders have ≤ 7–13 lines), so the pair shuffle scales
  with orders, never parts².
- ``user_gap_p95``: per-user 95th-percentile inter-event gap — the
  engagement-cadence / session-health metric. Gaps come from ONE
  user-keyed LAG window; the percentile is a positional pick inside
  the same user partition (user event counts are bounded; the
  percentile UDAF is avoided — the ``stats3.py`` Theil–Sen lesson).
- ``vocab_coverage_topk``: share of the token mass covered by the
  top-k vocabulary (k = 10/20/30) per language — the
  tokenizer-budget / OOV-planning curve next to ``zipf_token_audit``
  and ``token_entropy_by_lang``. Rank windows run over the
  vocab-sized aggregate only.

Parity:
- lift is integer counts into one fixed double expression
  (multiply/divide correctly rounded) — round 6; ordering is on the
  ROUNDED lift with pair tie-breaks so the top-k cutoff cannot flip;
- gaps are exact integer seconds (epoch arithmetic); the p95
  interpolation is written EXPLICITLY as lo + (hi−lo)·frac on both
  engines (the quantile_cont form — ``(a+b)/2``-style reassociations
  are NOT bit-safe, stats3 lesson);
- coverage shares are exact integer token counts divided once,
  round 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

_LIFT_MIN_SUPPORT = 2
_LIFT_TOP = 25

LIFT_ORACLE = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
),
n AS (SELECT COUNT(DISTINCT okey)::BIGINT AS n_orders FROM op),
freq AS (SELECT part, COUNT(*)::BIGINT AS nf FROM op GROUP BY part),
pairs AS (
  SELECT a.part AS part_a, b.part AS part_b, COUNT(*)::BIGINT AS n_ab
  FROM op a JOIN op b ON a.okey = b.okey AND a.part < b.part
  GROUP BY 1, 2
)
SELECT p.part_a, p.part_b, p.n_ab,
       ROUND(CAST(p.n_ab AS DOUBLE) * t.n_orders
             / (CAST(fa.nf AS DOUBLE) * fb.nf), 6) AS lift
FROM pairs p
JOIN freq fa ON p.part_a = fa.part
JOIN freq fb ON p.part_b = fb.part
CROSS JOIN n t
WHERE p.n_ab >= {_LIFT_MIN_SUPPORT}
ORDER BY lift DESC, p.part_a, p.part_b
LIMIT {_LIFT_TOP}
"""


@register("basket_part_lift", LIFT_ORACLE)
def basket_part_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part pairs by association lift over co-ordered baskets:
    (part_a, part_b, n_ab, lift), support ≥ {s}.""".format(
        s=_LIFT_MIN_SUPPORT
    )
    from tfm_semisup_spark.operators.lineage import truncate
    from tfm_semisup_spark.queries.analytics import (
        _basket_pairs,
        _order_part_baskets,
    )

    # r14 (guide §2.4 + the SCALE.md >=3-references rule): the old
    # DISTINCT(okey,part) projection fed FOUR un-checkpointed consumers
    # (n_orders, freq x2 broadcast sides, the okey self-join), so the
    # lineitem scan + distinct ran five times in one plan. One basket
    # aggregate, checkpointed, now feeds all of them; pairs come from
    # the suffix-explode Generate instead of the self-join.
    baskets = truncate(_order_part_baskets(spark, sf_dir), eager=True)
    n = F.broadcast(baskets.agg(F.count(F.lit(1)).alias("n_orders")))
    freq = (
        baskets.select(F.explode("parts").alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("nf"))
    )
    pairs = (
        _basket_pairs(baskets)
        .select(F.col("pa").alias("part_a"), F.col("pb").alias("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= _LIFT_MIN_SUPPORT)
    )
    fa = freq.select(F.col("part").alias("part_a"), F.col("nf").alias("nfa"))
    fb = freq.select(F.col("part").alias("part_b"), F.col("nf").alias("nfb"))
    lift = F.round(
        F.col("n_ab").cast("double")
        * F.col("n_orders")
        / (F.col("nfa").cast("double") * F.col("nfb")),
        6,
    )
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(n)
        .select("part_a", "part_b", "n_ab", lift.alias("lift"))
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(_LIFT_TOP)
    )


# ---------------------------------------------------------------------------
# Per-user p95 inter-event gap
# ---------------------------------------------------------------------------

GAP_P95_ORACLE = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
g AS (SELECT user_id, gap FROM gaps WHERE gap IS NOT NULL),
ranked AS (
  SELECT user_id, gap,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM g
),
picked AS (
  SELECT user_id, n,
         MIN(CASE WHEN rn = CAST(FLOOR(CAST(0.95 AS DOUBLE) * (n - 1))
                               AS BIGINT) + 1
                  THEN gap END) AS lo,
         MIN(CASE WHEN rn = LEAST(CAST(FLOOR(CAST(0.95 AS DOUBLE) * (n - 1))
                                     AS BIGINT) + 2,
                                  n)
                  THEN gap END) AS hi
  FROM ranked
  GROUP BY user_id, n
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_gaps,
       ROUND((lo + (hi - lo)
              * (CAST(0.95 AS DOUBLE) * (n - 1)
                 - FLOOR(CAST(0.95 AS DOUBLE) * (n - 1))))
             / 1000000.0, 4) AS p95_gap_sec
FROM picked
"""


@register("user_gap_p95", GAP_P95_ORACLE)
def user_gap_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95th-percentile inter-event gap per user:
    (user_id, n_gaps, p95_gap_sec) — explicit lo + (hi−lo)·frac
    interpolation on exact integer-MICROSECOND gaps (unix_timestamp
    truncates to seconds while DuckDB's epoch() keeps the fraction —
    per-timestamp micros are the only representation both engines
    agree on exactly; the /1e6 to seconds happens once at the end).
    The DuckDB 0.95 literal is CAST to DOUBLE: DuckDB parses bare
    decimals as DECIMAL and 0.95·(n−1) would be exact there but not
    in Spark's double math."""
    events = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select(
            "user_id",
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(wseq))
            ).alias("gap"),
        )
        .where(F.col("gap").isNotNull())
    )
    wrank = Window.partitionBy("user_id").orderBy("gap")
    wall = Window.partitionBy("user_id")
    ranked = gaps.select(
        "user_id",
        "gap",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    pos = 0.95 * (F.col("n") - 1)
    lo_rn = F.floor(pos).cast("bigint") + 1
    hi_rn = F.least(lo_rn + 1, F.col("n"))
    picked = ranked.groupBy("user_id", "n").agg(
        F.min(F.when(F.col("rn") == lo_rn, F.col("gap"))).alias("lo"),
        F.min(F.when(F.col("rn") == hi_rn, F.col("gap"))).alias("hi"),
    )
    frac = 0.95 * (F.col("n") - 1) - F.floor(0.95 * (F.col("n") - 1))
    return picked.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_gaps"),
        F.round(
            (F.col("lo") + (F.col("hi") - F.col("lo")) * frac) / 1000000.0,
            4,
        ).alias("p95_gap_sec"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (top-k token-mass share)
# ---------------------------------------------------------------------------

_COV_KS = (10, 20, 30)

COVERAGE_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> ''))
           AS w
  FROM documents
),
wc AS (SELECT lang, w, COUNT(*)::BIGINT AS c FROM tok GROUP BY lang, w),
ranked AS (
  SELECT lang, c,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rk,
         SUM(c) OVER (PARTITION BY lang) AS total
  FROM wc
)
SELECT lang, CAST(k.k AS BIGINT) AS k,
       ROUND(CAST(SUM(CASE WHEN rk <= k.k THEN c ELSE 0 END) AS DOUBLE)
             / MAX(total), 6) AS coverage
FROM ranked, (VALUES {", ".join(f"({k})" for k in _COV_KS)}) AS k(k)
GROUP BY lang, k.k
"""


@register("vocab_coverage_topk", COVERAGE_ORACLE)
def vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass share covered by the top-k vocabulary per language,
    k ∈ {ks}: (lang, k, coverage).""".format(ks=_COV_KS)
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "lang",
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("w"),
        )
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = wc.select(
        "lang",
        "c",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy(F.col("c").desc(), "w"))
        .alias("rk"),
        F.sum("c").over(Window.partitionBy("lang")).alias("total"),
    )
    ks = spark.createDataFrame([(k,) for k in _COV_KS], "k int")
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("lang", "k")
        .agg(
            F.round(
                F.sum(F.when(F.col("rk") <= F.col("k"), F.col("c")).otherwise(0))
                .cast("double")
                / F.max("total"),
                6,
            ).alias("coverage")
        )
        .select("lang", F.col("k").cast("bigint").alias("k"), "coverage")
    )


# ---------------------------------------------------------------------------
# Attribution-window sensitivity (parameter grid in ONE pass)
# ---------------------------------------------------------------------------
#
# How sensitive is the view→purchase conversion rate to the
# attribution window? The parameter-sweep shape done right at scale:
# per-user firsts are computed ONCE (one fact aggregate), then the
# whole window grid {1h, 6h, 24h, 72h} is evaluated as conditional
# aggregates over those 150-ish rows — one scan for the entire grid,
# never one scan per configuration. Latencies compare in exact
# integer microseconds (the user_gap_p95 lesson).

_AW_HOURS = (1, 6, 24, 72)

AW_ORACLE = f"""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events
  GROUP BY user_id
),
lat AS (
  SELECT user_id,
         CASE WHEN fp IS NOT NULL AND fp >= fv
              THEN epoch_us(fp) - epoch_us(fv) END AS lat_us
  FROM firsts WHERE fv IS NOT NULL
)
SELECT CAST(w.h AS BIGINT) AS window_hours,
       COUNT(*)::BIGINT AS n_users,
       SUM(CASE WHEN lat_us IS NOT NULL
                 AND lat_us <= w.h * 3600000000 THEN 1 ELSE 0 END)::BIGINT
         AS n_converted,
       ROUND(CAST(SUM(CASE WHEN lat_us IS NOT NULL
                            AND lat_us <= w.h * 3600000000
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS rate
FROM lat, (VALUES {", ".join(f"({h})" for h in _AW_HOURS)}) AS w(h)
GROUP BY w.h
"""


@register("funnel_window_sensitivity", AW_ORACLE)
def funnel_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion under the attribution-window grid
    {w}: (window_hours, n_users, n_converted, rate) — per-user firsts
    once, the grid as conditional aggregates.""".format(w=_AW_HOURS)
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "fp"
        ),
    )
    lat = firsts.where(F.col("fv").isNotNull()).select(
        F.when(
            F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv")),
            F.unix_micros("fp") - F.unix_micros("fv"),
        ).alias("lat_us")
    )
    hours = spark.createDataFrame([(h,) for h in _AW_HOURS], "h int")
    converted = F.sum(
        F.when(
            F.col("lat_us").isNotNull()
            & (F.col("lat_us") <= F.col("h").cast("bigint") * 3600000000),
            1,
        ).otherwise(0)
    )
    return (
        lat.crossJoin(F.broadcast(hours))
        .groupBy(F.col("h").cast("bigint").alias("window_hours"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            converted.cast("bigint").alias("n_converted"),
            F.round(
                converted.cast("double") / F.count(F.lit(1)), 6
            ).alias("rate"),
        )
    )


# ---------------------------------------------------------------------------
# Cogrouped-Arrow as-of reconciliation (the cogroup().applyInPandas API)
# ---------------------------------------------------------------------------
#
# The one grouped-Arrow surface the engine had not yet exercised:
# df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas — BOTH sides of
# a key arrive in the same Python kernel as pandas frames (the shape
# for per-key imperative two-table logic: custom reconciliation,
# per-entity model scoring against reference curves). Demonstrated as
# per-user backward as-of matching of purchases to the latest prior
# view via pandas.merge_asof INSIDE the kernel — and oracled against
# the relational as-of formulation, so the imperative path is held to
# the declarative one's answer. Timestamps cross the boundary as exact
# integer microseconds (the user_gap_p95 parity lesson); lag sums are
# integer.
#
# 100 TB shape: cogroup shuffles each side ONCE on user_id into the
# Arrow kernel — per-user state never crosses keys, kernels stream
# batches per group. (For pure as-of matching the declarative
# operators/asof.py join is still the default — this entry exists to
# verify the cogroup plumbing against it.)

COGROUP_ASOF_ORACLE = """
WITH v AS (
  SELECT user_id, epoch_us(ts) AS vt FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, event_id, epoch_us(ts) AS pt
  FROM events WHERE event_type = 'purchase'
),
matched AS (
  SELECT p.user_id, p.event_id, p.pt,
         (SELECT MAX(v.vt) FROM v
          WHERE v.user_id = p.user_id AND v.vt <= p.pt) AS mv
  FROM p
)
SELECT user_id,
       COUNT(*)::BIGINT AS n_purchases,
       SUM(CASE WHEN mv IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_matched,
       CAST(COALESCE(SUM(pt - mv), 0) AS BIGINT) AS lag_us_sum
FROM matched
GROUP BY user_id
"""


@register("cogroup_asof_reconciliation", COGROUP_ASOF_ORACLE)
def cogroup_asof_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user backward as-of matching (purchase → latest prior view)
    through cogroup().applyInPandas with merge_asof inside the kernel:
    (user_id, n_purchases, n_matched, lag_us_sum)."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view").select(
        "user_id", F.unix_micros("ts").alias("vt")
    )
    purch = events.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("pt")
    )

    def match(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left = purchases, right = views — one user per call
        if left.empty:
            # typed empty frame: object-dtype columns fail the Arrow
            # conversion for long output fields
            return pd.DataFrame(
                {
                    c: pd.Series(dtype="int64")
                    for c in ("user_id", "n_purchases", "n_matched", "lag_us_sum")
                }
            )
        uid = int(left["user_id"].iloc[0])
        lp = left.sort_values(["pt", "event_id"]).reset_index(drop=True)
        if right.empty:
            return pd.DataFrame(
                {
                    "user_id": [uid],
                    "n_purchases": [len(lp)],
                    "n_matched": [0],
                    "lag_us_sum": [0],
                }
            )
        rv = right.sort_values("vt").reset_index(drop=True)
        m = pd.merge_asof(
            lp, rv.rename(columns={"vt": "mv"}), left_on="pt",
            right_on="mv", direction="backward",
        )
        lag = (m["pt"] - m["mv"]).dropna()
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_purchases": [len(lp)],
                "n_matched": [int(m["mv"].notna().sum())],
                "lag_us_sum": [int(lag.sum())],
            }
        )

    return (
        purch.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(
            match,
            schema=(
                "user_id long, n_purchases long, n_matched long, "
                "lag_us_sum long"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Sweep-line interval counting: open orders per day
# ---------------------------------------------------------------------------
#
# "How many orders were open on day D" — the interval-stabbing count
# behind backlog/WIP/concurrency dashboards. The naive form joins the
# day grid against the interval table (days × orders comparisons); the
# sweep-line re-expression emits +1 at each order's start day and −1
# the day after its close (max lineitem ship date), aggregates the
# deltas to the bounded day grid, and takes a running sum — fact rows
# are touched ONCE and the window runs over the calendar-bounded grid
# (the EWMA/ks_price discipline). All counts exact integers.

OPEN_ORDERS_ORACLE = """
WITH iv AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS d0,
         MAX(CAST(l.l_shipdate AS DATE)) AS d1
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
),
deltas AS (
  SELECT d0 AS day, 1 AS delta FROM iv
  UNION ALL
  SELECT d1 + 1, -1 FROM iv
),
daily AS (
  SELECT day, SUM(delta)::BIGINT AS delta FROM deltas GROUP BY day
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(SUM(delta) OVER (ORDER BY day) AS BIGINT) AS open_orders
FROM daily
"""


@register("open_orders_daily", OPEN_ORDERS_ORACLE)
def open_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order count per day via the sweep-line (+1/−1 deltas +
    running sum over the bounded day grid): (day, open_orders)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("d0")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    iv = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "d0")
        .agg(F.max("sd").alias("d1"))
    )
    deltas = iv.select(F.col("d0").alias("day"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.date_add("d1", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(
        F.sum("delta").cast("bigint").alias("delta")
    )
    w = Window.orderBy("day")  # bounded: one row per calendar day
    return daily.select(
        F.col("day").cast("string").alias("day"),
        F.sum("delta").over(w).cast("bigint").alias("open_orders"),
    )


# ---------------------------------------------------------------------------
# Join-key skew report (pre-join diagnostics)
# ---------------------------------------------------------------------------
#
# The check run BEFORE a big join: per candidate key, its cardinality
# and how much mass the heaviest key carries (top-1 share ≈ the skew
# that decides salting / AQE skew-join). One aggregate per key column,
# unioned — each is a wordcount-shaped pass with map-side combine; the
# top-1 pick is an integer argmax over the (key,count) aggregate with
# a key tie-break.

_SKEW_KEYS = (
    ("orders", "o_custkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("events", "user_id"),
)


def _skew_leg_sql(table: str, col: str) -> str:
    return f"""
SELECT '{table}.{col}' AS key_col,
       SUM(cnt)::BIGINT AS n_rows,
       COUNT(*)::BIGINT AS n_keys,
       CAST(MAX(cnt) AS BIGINT) AS top1_rows,
       ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top1_share
FROM (SELECT {col}, COUNT(*) AS cnt FROM {table} GROUP BY {col})"""


SKEW_ORACLE = "\nUNION ALL\n".join(
    _skew_leg_sql(t, c) for t, c in _SKEW_KEYS
)


@register("join_key_skew_report", SKEW_ORACLE)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostics for the join-key columns:
    (key_col, n_rows, n_keys, top1_rows, top1_share)."""
    legs = []
    for table, col in _SKEW_KEYS:
        grouped = (
            load_table(spark, sf_dir, table)
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        legs.append(
            grouped.agg(
                F.lit(f"{table}.{col}").alias("key_col"),
                F.sum("cnt").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.max("cnt").cast("bigint").alias("top1_rows"),
                F.round(
                    F.max("cnt").cast("double") / F.sum("cnt"), 6
                ).alias("top1_share"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out


# ---------------------------------------------------------------------------
# Cohort LTV curve (cumulative value by months-since-first-seen)
# ---------------------------------------------------------------------------
#
# The revenue twin of retention_cohort_daily: users grouped by their
# first-seen month, purchase value accumulated by months-since — the
# LTV curve every growth dashboard plots. One fact pass to per-user
# firsts, one to (cohort, months_since) cents, then a running sum over
# the bounded cohort×month grid. Value is quantized to integer cents
# at the scan (the repo-wide money rule); month arithmetic uses the
# same date_trunc/months_between integers on both engines.

LTV_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('month', MIN(ts)) AS cohort
  FROM events GROUP BY user_id
),
purchases AS (
  SELECT e.user_id,
         CAST(FLOOR(e.value * 100) AS BIGINT) AS cents,
         date_trunc('month', e.ts) AS pmonth
  FROM events e WHERE e.event_type = 'purchase'
),
cells AS (
  SELECT strftime(f.cohort, '%Y-%m') AS cohort_month,
         CAST(datediff('month', f.cohort, p.pmonth) AS BIGINT)
           AS months_since,
         SUM(p.cents)::BIGINT AS cents
  FROM purchases p JOIN firsts f ON p.user_id = f.user_id
  GROUP BY 1, 2
),
sizes AS (
  SELECT strftime(cohort, '%Y-%m') AS cohort_month,
         COUNT(*)::BIGINT AS n_users
  FROM firsts GROUP BY 1
)
SELECT c.cohort_month, c.months_since, s.n_users,
       CAST(SUM(c.cents) OVER (
         PARTITION BY c.cohort_month ORDER BY c.months_since
       ) AS BIGINT) AS cum_value_cents
FROM cells c JOIN sizes s ON c.cohort_month = s.cohort_month
"""


@register("cohort_ltv_curve", LTV_ORACLE)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative purchase value per first-seen-month cohort:
    (cohort_month, months_since, n_users, cum_value_cents) — running
    sum over the bounded cohort×month grid."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("cohort")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        F.date_trunc("month", F.col("ts")).alias("pmonth"),
    )
    cells = (
        purchases.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            F.months_between(
                F.col("pmonth"), F.col("cohort")
            ).cast("bigint").alias("months_since"),
        )
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    sizes = firsts.groupBy(
        F.date_format("cohort", "yyyy-MM").alias("cohort_month")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    w = Window.partitionBy("cohort_month").orderBy("months_since")
    return (
        cells.join(sizes, "cohort_month")
        .select(
            "cohort_month",
            "months_since",
            "n_users",
            F.sum("cents").over(w).cast("bigint").alias("cum_value_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Error-burst detection (max consecutive-run length per user)
# ---------------------------------------------------------------------------
#
# Reliability forensics: the longest consecutive run of 'error' events
# per user (a burst means a stuck client/retry loop, not background
# noise). The classic gaps-and-islands re-expression: island id =
# row_number over the user stream minus row_number over the user's
# error-only stream — both windows are user-keyed (bounded per-user
# state, shards across executors), never a global sort. Tie-break on
# event_id makes the sequence order total, so runs are identical in
# both engines.

ERROR_BURST_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn_all,
         CASE WHEN event_type = 'error' THEN
           ROW_NUMBER() OVER (
             PARTITION BY user_id,
                          CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
             ORDER BY ts, event_id)
         END AS rn_err
  FROM events
),
runs AS (
  SELECT user_id, rn_all - rn_err AS island, COUNT(*)::BIGINT AS run_len
  FROM seq WHERE event_type = 'error'
  GROUP BY user_id, rn_all - rn_err
)
SELECT user_id,
       COUNT(*)::BIGINT AS n_bursts,
       CAST(MAX(run_len) AS BIGINT) AS max_run,
       CAST(SUM(run_len) AS BIGINT) AS n_errors
FROM runs
GROUP BY user_id
"""


@register("error_burst_maxrun", ERROR_BURST_ORACLE)
def error_burst_maxrun(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive 'error' run per user via gaps-and-islands:
    (user_id, n_bursts, max_run, n_errors)."""
    events = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_err = Window.partitionBy(
        "user_id", (F.col("event_type") == "error").cast("int")
    ).orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "event_type",
        F.row_number().over(w_all).alias("rn_all"),
        F.when(
            F.col("event_type") == "error", F.row_number().over(w_err)
        ).alias("rn_err"),
    )
    runs = (
        seq.where(F.col("event_type") == "error")
        .groupBy("user_id", (F.col("rn_all") - F.col("rn_err")).alias("island"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("run_len"))
    )
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bursts"),
        F.max("run_len").cast("bigint").alias("max_run"),
        F.sum("run_len").cast("bigint").alias("n_errors"),
    )


# ---------------------------------------------------------------------------
# Monthly seasonal index (month share of annual revenue)
# ---------------------------------------------------------------------------
#
# The classical seasonality index: each month's share of its year's
# revenue, averaged across years — the deseasonalization factor for
# forecasting (the month-of-year twin of dow_seasonal_residuals'
# weekday screen). ORDER-INDEPENDENT by construction (ADVICE r8 #2 —
# the first cut averaged per-year double shares, the probabilistic
# summation-order boundary class the ewma lesson closed): each
# (month, year) share is quantized to an exact integer
# floor(cents · 10^12 / ytotal) — both engines compute it as exact
# integer arithmetic (Spark: pmod-subtract then an exact decimal
# division; DuckDB: HUGEINT //) — the across-years SUM is then an
# integer aggregate (order-free), and the single double division
# happens once at the end on bit-identical inputs. Quantization error
# < n_years/10^12, invisible at round-6.

_SEASONAL_SCALE = 1_000_000_000_000  # 10^12

SEASONAL_INDEX_ORACLE = f"""
WITH cells AS (
  SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS y,
         EXTRACT(month FROM o_orderdate)::BIGINT AS m,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1, 2
),
yearly AS (
  SELECT y, m, cents,
         SUM(cents) OVER (PARTITION BY y) AS ytotal
  FROM cells
),
quantized AS (
  SELECT m, ((cents::HUGEINT * {_SEASONAL_SCALE}) // ytotal) AS q
  FROM yearly
)
SELECT m AS month,
       COUNT(*)::BIGINT AS n_years,
       ROUND(CAST(12 AS DOUBLE) * CAST(SUM(q) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * CAST({_SEASONAL_SCALE} AS DOUBLE)),
             6) AS seasonal_index
FROM quantized
GROUP BY m
"""


@register("monthly_seasonal_index", SEASONAL_INDEX_ORACLE)
def monthly_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality index of revenue (1.0 = an average
    month): (month, n_years, seasonal_index)."""
    orders = load_table(spark, sf_dir, "orders")
    cells = (
        orders.select(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("c100"),
        )
        .groupBy("y", "m")
        .agg(F.sum("c100").cast("bigint").alias("cents"))
    )
    yearly = cells.withColumn(
        "ytotal", F.sum("cents").over(Window.partitionBy("y"))
    )
    # exact integer quantized share: floor(cents*10^12 / ytotal).
    # pmod-subtract makes the numerator exactly divisible, so the
    # decimal division is exact (no rounding mode in play) and equals
    # DuckDB's HUGEINT floor-division bit-for-bit.
    num = F.col("cents").cast("decimal(38,0)") * F.lit(_SEASONAL_SCALE)
    ytot = F.col("ytotal").cast("decimal(38,0)")
    q = ((num - F.pmod(num, ytot)) / ytot).cast("decimal(38,0)")
    quantized = yearly.select("m", q.alias("q"))
    return quantized.groupBy(F.col("m").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_years"),
        F.round(
            F.lit(12.0)
            * F.sum("q").cast("double")
            / (
                F.count(F.lit(1)).cast("double")
                * F.lit(float(_SEASONAL_SCALE))
            ),
            6,
        ).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# 3-itemset support (the Apriori level-3 pass)
# ---------------------------------------------------------------------------
#
# Extends basket_part_lift's pair rules to triples: parts co-ordered
# as a 3-set in ≥ _TRIPLE_MIN_SUPPORT orders. Fan-out per order is
# C(lines, 3) ≤ C(13,3) = 286 — bounded by the basket size at any
# corpus scale, the same argument as the pair pass (this is exactly
# why Apriori-on-SQL stays feasible: candidate growth is bounded by
# basket width, not catalog size). Exact integer supports, (a,b,c)
# tie-broken ordering.

_TRIPLE_MIN_SUPPORT = 2
_TRIPLE_TOP = 20

TRIPLES_ORACLE = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
)
SELECT a.part AS part_a, b.part AS part_b, c.part AS part_c,
       COUNT(*)::BIGINT AS support
FROM op a
JOIN op b ON a.okey = b.okey AND a.part < b.part
JOIN op c ON b.okey = c.okey AND b.part < c.part
GROUP BY 1, 2, 3
HAVING COUNT(*) >= {_TRIPLE_MIN_SUPPORT}
ORDER BY support DESC, part_a, part_b, part_c
LIMIT {_TRIPLE_TOP}
"""


@register("basket_part_triples", TRIPLES_ORACLE)
def basket_part_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-ordered part TRIPLES by support (≥ {s}):
    (part_a, part_b, part_c, support).""".format(s=_TRIPLE_MIN_SUPPORT)
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    a = op.select("okey", F.col("part").alias("part_a"))
    b = op.select("okey", F.col("part").alias("part_b"))
    c = op.select("okey", F.col("part").alias("part_c"))
    return (
        a.join(b, "okey")
        .where(F.col("part_a") < F.col("part_b"))
        .join(c, "okey")
        .where(F.col("part_b") < F.col("part_c"))
        .groupBy("part_a", "part_b", "part_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= _TRIPLE_MIN_SUPPORT)
        .orderBy(F.desc("support"), "part_a", "part_b", "part_c")
        .limit(_TRIPLE_TOP)
    )


# ---------------------------------------------------------------------------
# Supplier-concentration HHI per part
# ---------------------------------------------------------------------------
#
# The Herfindahl–Hirschman index of each part's supply: HHI =
# Σ_s share_s² over supplier quantity shares — the supply-chain
# single-source-risk audit (HHI → 1 means one supplier carries the
# part). Quantities are integer-valued doubles cast to BIGINT, so
# Σq² and (Σq)² are exact integers; HHI is ONE double division of
# exact operands — bit-identical cross-engine — and the top-k orders
# on the rounded value with a part tie-break.

_HHI_TOP = 20
_HHI_MIN_SUPPLIERS = 3

HHI_ORACLE = f"""
WITH sq AS (
  SELECT l_partkey AS part, l_suppkey AS supp,
         SUM(CAST(l_quantity AS BIGINT))::BIGINT AS q
  FROM lineitem GROUP BY 1, 2
),
agg AS (
  SELECT part,
         COUNT(*)::BIGINT AS n_suppliers,
         SUM(CAST(q AS HUGEINT) * q) AS sum_q2,
         SUM(CAST(q AS HUGEINT)) AS sum_q
  FROM sq GROUP BY part
)
SELECT part, n_suppliers,
       ROUND(CAST(sum_q2 AS DOUBLE)
             / (CAST(sum_q AS DOUBLE) * CAST(sum_q AS DOUBLE)), 6) AS hhi
FROM agg
WHERE n_suppliers >= {_HHI_MIN_SUPPLIERS}
ORDER BY hhi DESC, part
LIMIT {_HHI_TOP}
"""


@register("supplier_hhi_by_part", HHI_ORACLE)
def supplier_hhi_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most supplier-concentrated parts by HHI (≥ {m} suppliers):
    (part, n_suppliers, hhi).""".format(m=_HHI_MIN_SUPPLIERS)
    li = load_table(spark, sf_dir, "lineitem")
    sq = (
        li.select(
            F.col("l_partkey").alias("part"),
            F.col("l_suppkey").alias("supp"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .groupBy("part", "supp")
        .agg(F.sum("qty").cast("bigint").alias("q"))
    )
    dec = F.col("q").cast("decimal(38,0)")
    agg = sq.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(dec * F.col("q")).alias("sum_q2"),
        F.sum(dec).alias("sum_q"),
    )
    hhi = F.round(
        F.col("sum_q2").cast("double")
        / (F.col("sum_q").cast("double") * F.col("sum_q").cast("double")),
        6,
    )
    return (
        agg.where(F.col("n_suppliers") >= _HHI_MIN_SUPPLIERS)
        .select("part", "n_suppliers", hhi.alias("hhi"))
        .orderBy(F.desc("hhi"), "part")
        .limit(_HHI_TOP)
    )


# ---------------------------------------------------------------------------
# Nation trade balance (two-perspective star traversal)
# ---------------------------------------------------------------------------
#
# Per nation: revenue where its customers BUY vs revenue where its
# suppliers SELL, and the net balance — the two-perspective traversal
# of the same fact table through two different dimension paths
# (lineitem→orders→customer→nation vs lineitem→supplier→nation). Each
# leg is one fact aggregation with broadcast-able schema-bounded dims
# (nation 25 rows; customer/supplier left to AQE per the r5 hint
# policy); the legs meet in a 25-row full-outer merge. Integer cents
# throughout; the discounted revenue is quantized per line BEFORE
# aggregation (floor(extprice·(1−disc)·100) — identical expression
# both engines).

TRADE_BALANCE_ORACLE = """
WITH buy AS (
  SELECT n.n_name AS nation,
         SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
             AS BIGINT))::BIGINT AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
sell AS (
  SELECT n.n_name AS nation,
         SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
             AS BIGINT))::BIGINT AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT COALESCE(b.nation, s.nation) AS nation,
       CAST(COALESCE(b.cents, 0) AS BIGINT) AS buy_cents,
       CAST(COALESCE(s.cents, 0) AS BIGINT) AS sell_cents,
       CAST(COALESCE(s.cents, 0) - COALESCE(b.cents, 0) AS BIGINT)
         AS net_cents
FROM buy b FULL OUTER JOIN sell s ON b.nation = s.nation
"""


@register("nation_trade_balance", TRADE_BALANCE_ORACLE)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation buy-side vs sell-side revenue and net balance:
    (nation, buy_cents, sell_cents, net_cents)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("bigint").alias("cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    buy = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("cents").cast("bigint").alias("buy_cents"))
    )
    # supplier is sf-scaled — no forced broadcast (ADVICE r8 #1; the
    # r5 hint policy: hints only on schema-bounded relations like
    # nation). AQE still picks a broadcast join at bench SFs.
    sell = (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("cents").cast("bigint").alias("sell_cents"))
    )
    return (
        buy.join(sell, "nation", "full_outer")
        .select(
            "nation",
            F.coalesce("buy_cents", F.lit(0)).cast("bigint").alias("buy_cents"),
            F.coalesce("sell_cents", F.lit(0))
            .cast("bigint")
            .alias("sell_cents"),
            (
                F.coalesce("sell_cents", F.lit(0))
                - F.coalesce("buy_cents", F.lit(0))
            )
            .cast("bigint")
            .alias("net_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Linear multi-touch attribution
# ---------------------------------------------------------------------------
#
# The multi-touch counterpart to attribution_last_touch: every
# non-purchase touch BEFORE a user's first purchase shares the
# conversion credit equally (1/n per touch). The per-user fraction is
# quantized to the exact integer floor(10^12/n) (pmod-subtract on
# Spark, ``//`` HUGEINT in DuckDB) so the cross-user credit sums are
# order-free integers; the single double division happens once per
# output row. Same closure as monthly_seasonal_index — fractional
# credit is exactly where per-row double sums would be
# partition-order-dependent.
#
# 100 TB shape: one per-user aggregate finds the first purchase, one
# (user, type) aggregate counts touches — both user-keyed shuffles;
# the credit table is |event types| rows.

_ATTR_SCALE = 1_000_000_000_000  # 10^12

ATTR_LINEAR_ORACLE = f"""
WITH firstp AS (
  SELECT user_id, MIN(ts) AS fp FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
),
touches AS (
  SELECT e.user_id, e.event_type
  FROM events e JOIN firstp f ON e.user_id = f.user_id
  WHERE e.event_type <> 'purchase' AND e.ts <= f.fp
),
per_user AS (
  SELECT user_id, event_type, COUNT(*)::HUGEINT AS n_ut
  FROM touches GROUP BY user_id, event_type
),
tot AS (
  SELECT user_id, SUM(n_ut) AS n_u,
         ({_ATTR_SCALE} // SUM(n_ut)) AS q_u
  FROM per_user GROUP BY user_id
)
SELECT p.event_type,
       SUM(p.n_ut)::BIGINT AS n_touches,
       COUNT(DISTINCT p.user_id)::BIGINT AS n_users,
       ROUND(CAST(SUM(p.n_ut * t.q_u) AS DOUBLE)
             / CAST({_ATTR_SCALE} AS DOUBLE), 6) AS credit
FROM per_user p JOIN tot t ON p.user_id = t.user_id
GROUP BY p.event_type
"""


@register("attribution_linear", ATTR_LINEAR_ORACLE)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution of first purchases:
    (event_type, n_touches, n_users, credit) — credit in conversion
    units, exact-integer quantized per user."""
    events = load_table(spark, sf_dir, "events")
    firstp = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    touches = (
        events.where(F.col("event_type") != "purchase")
        .join(firstp, "user_id")
        .where(F.col("ts") <= F.col("fp"))
    )
    per_user = touches.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_ut")
    )
    scale = F.lit(_ATTR_SCALE).cast("decimal(38,0)")
    tot = per_user.groupBy("user_id").agg(
        F.sum("n_ut").alias("n_u"),
    ).select(
        "user_id",
        "n_u",
        ((scale - F.pmod(scale, F.col("n_u"))) / F.col("n_u"))
        .cast("decimal(38,0)")
        .alias("q_u"),
    )
    return (
        per_user.join(tot, "user_id")
        .groupBy("event_type")
        .agg(
            F.sum("n_ut").cast("bigint").alias("n_touches"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(
                F.sum(F.col("n_ut") * F.col("q_u")).cast("double")
                / F.lit(float(_ATTR_SCALE)),
                6,
            ).alias("credit"),
        )
    )


# ---------------------------------------------------------------------------
# Event-type Markov chain: transition matrix + stationary distribution
# ---------------------------------------------------------------------------
#
# Where does a user's session settle? Build the first-order Markov
# transition matrix over per-user event sequences and run THREE
# quantized power iterations from the uniform vector — the
# fixed-iteration discipline (PageRank/BFS/k-core) that keeps an
# iterative linear-algebra operator exactly SQL-expressible. All
# iteration arithmetic is integer: v starts at floor(10^12/k) per
# state and each step sums per-edge terms floor(v_i·n_ij/n_i) —
# exact integer division on both engines, so three unrolled CTE
# rounds in DuckDB reproduce the Spark loop bit-for-bit. Floor mass
# leakage is ≤ k per step (≤ 15e-12 total) — invisible at round 6
# and identical cross-engine anyway.
#
# 100 TB shape: ONE user-keyed LAG window builds transitions; the
# matrix is a |types|² ≤ 25-cell grid, and every iteration is
# grid-sized (broadcast) work.

_MARKOV_SCALE = 1_000_000_000_000  # 10^12
_MARKOV_ITERS = 3


def _markov_oracle() -> str:
    step = """
v{j} AS (
  SELECT t.nxt AS state,
         SUM((v.q * t.n_ij) // t.n_i) AS q
  FROM v{i} v JOIN trans t ON v.state = t.prev
  GROUP BY t.nxt
)"""
    steps = ",".join(
        step.format(i=i, j=i + 1) for i in range(_MARKOV_ITERS)
    )
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
trans0 AS (
  SELECT prev, event_type AS nxt, COUNT(*)::HUGEINT AS n_ij
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
),
trans AS (
  SELECT prev, nxt, n_ij,
         SUM(n_ij) OVER (PARTITION BY prev) AS n_i
  FROM trans0
),
states AS (SELECT DISTINCT event_type AS state FROM events),
k AS (SELECT COUNT(*)::HUGEINT AS k FROM states),
v0 AS (
  SELECT state, ({_MARKOV_SCALE} // (SELECT k FROM k)) AS q FROM states
),
{steps},
tot AS (SELECT SUM(q) AS t FROM v{_MARKOV_ITERS})
SELECT s.state,
       COALESCE(v.q, 0)::BIGINT AS mass_q,
       ROUND(CAST(COALESCE(v.q, 0) AS DOUBLE)
             / CAST((SELECT t FROM tot) AS DOUBLE), 6) AS stationary_prob
FROM states s LEFT JOIN v{_MARKOV_ITERS} v ON s.state = v.state
"""


@register("event_markov_stationary", _markov_oracle())
def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution (3 quantized power iterations) of the
    per-user event-type Markov chain: (state, mass_q,
    stationary_prob)."""
    from tfm_semisup_spark.operators.lineage import truncate

    events = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(wseq).alias("prev")
    )
    trans0 = (
        seq.where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("nxt"))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n_ij"))
    )
    trans = trans0.withColumn(
        "n_i", F.sum("n_ij").over(Window.partitionBy("prev"))
    )
    # the ≤25-cell matrix feeds every iteration — materialize once so
    # the fact-scale LAG window runs once, not per round
    trans = truncate(trans, eager=True)
    states = events.select(
        F.col("event_type").alias("state")
    ).distinct()
    states = truncate(states, eager=True)
    k = states.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("k"))
    scale = F.lit(_MARKOV_SCALE).cast("decimal(38,0)")
    v = states.crossJoin(F.broadcast(k)).select(
        "state",
        ((scale - F.pmod(scale, F.col("k"))) / F.col("k"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    for _ in range(_MARKOV_ITERS):
        term_num = F.col("q") * F.col("n_ij")
        term = ((term_num - F.pmod(term_num, F.col("n_i"))) / F.col("n_i")).cast(
            "decimal(38,0)"
        )
        v = (
            v.join(F.broadcast(trans), v.state == trans.prev)
            .select(F.col("nxt").alias("state"), term.alias("term"))
            .groupBy("state")
            .agg(F.sum("term").cast("decimal(38,0)").alias("q"))
        )
    tot = v.agg(F.sum("q").alias("t"))
    return (
        states.join(v, "state", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "state",
            F.coalesce(F.col("q"), F.lit(0)).cast("bigint").alias("mass_q"),
            F.round(
                F.coalesce(F.col("q"), F.lit(0)).cast("double")
                / F.col("t").cast("double"),
                6,
            ).alias("stationary_prob"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom semi-join reduction (runtime-filter pushdown)
# ---------------------------------------------------------------------------
#
# Revenue shipped by suppliers of ONE nation (synthetic names
# NATION_0..24; NATION_19 — the sf0.001 supplier table has only 10
# rows and some nations get none, so the nation is chosen non-empty at
# every SF, r13 vacuity audit): the dimension side is
# ~4% selective, so ~96% of lineitem rows would shuffle only to be
# dropped at the join. `operators/bloom_join.py` builds an 8 KiB
# bitset from the qualifying supplier keys and probes it in a
# codegen Filter ON THE SCAN, so only matching ∪ false-positive rows
# reach the Exchange. The ORACLE is the plain join — the driver's
# hash compare is itself the proof that the pruning is lossless (the
# prefix-filter Jaccard precedent).

BLOOM_SEMIJOIN_ORACLE = """
SELECT n.n_name AS nation,
       COUNT(*)::BIGINT AS n_lineitems,
       SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
           AS BIGINT))::BIGINT AS revenue_cents
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_19'
GROUP BY n.n_name
"""


@register("bloom_semijoin_volume", BLOOM_SEMIJOIN_ORACLE)
def bloom_semijoin_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from one nation's suppliers via a bloom-pruned join:
    (nation, n_lineitems, revenue_cents)."""
    from tfm_semisup_spark.operators.bloom_join import bloom_semijoin

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("bigint").alias("cents"),
    )
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_19"
    )
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    joined = bloom_semijoin(li, supplier, "l_suppkey", "s_suppkey")
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Time-decay multi-touch attribution (r10)
# ---------------------------------------------------------------------------
#
# The third attribution kernel next to last-touch and linear: touches
# closer to the conversion earn exponentially more credit. Weights are
# EXACT powers of two — w = 2^(20 − min(age_days // 7, 20)) (7-day
# half-life, bit-shifted on both engines, never a double pow) — and
# the per-(user, type) credit fraction is quantized to
# floor(Σ n·w · 10^12 / W_u) exactly like attribution_linear, so every
# cross-user sum is an order-free integer. Magnitude bound:
# numer·10^12 ≤ touches·2^20·10^12 < 10^38 through sf10.
#
# 100 TB shape identical to the linear kernel: one user-keyed shuffle
# for first purchases, one (user, type, week-bucket) aggregate, then
# integer rollups.

ATTR_DECAY_ORACLE = f"""
WITH firstp AS (
  SELECT user_id, MIN(ts) AS fp FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
),
touches AS (
  SELECT e.user_id, e.event_type,
         (1::HUGEINT << (20 - LEAST(
            date_diff('day', CAST(e.ts AS DATE), CAST(f.fp AS DATE)) // 7,
            20)::INT)) AS w
  FROM events e JOIN firstp f ON e.user_id = f.user_id
  WHERE e.event_type <> 'purchase' AND e.ts <= f.fp
),
per_ut AS (
  SELECT user_id, event_type, COUNT(*)::HUGEINT AS n_ut,
         SUM(w)::HUGEINT AS w_ut
  FROM touches GROUP BY user_id, event_type
),
tot AS (
  SELECT user_id, SUM(w_ut) AS w_u FROM per_ut GROUP BY user_id
)
SELECT p.event_type,
       SUM(p.n_ut)::BIGINT AS n_touches,
       COUNT(DISTINCT p.user_id)::BIGINT AS n_users,
       ROUND(CAST(SUM((p.w_ut * {_ATTR_SCALE}) // t.w_u) AS DOUBLE)
             / CAST({_ATTR_SCALE} AS DOUBLE), 6) AS credit
FROM per_ut p JOIN tot t ON p.user_id = t.user_id
GROUP BY p.event_type
"""


@register("attribution_time_decay", ATTR_DECAY_ORACLE)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution of first purchases
    (7-day-half-life powers of two): (event_type, n_touches, n_users,
    credit)."""
    events = load_table(spark, sf_dir, "events")
    firstp = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    # SQL form: the DataFrame shiftleft() only takes a literal bit
    # count, the SQL function takes a column
    w = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), 20 - LEAST("
        "CAST(FLOOR(datediff(to_date(fp), to_date(ts)) / 7) AS INT), 20))"
        " AS DECIMAL(38,0))"
    )
    touches = (
        events.where(F.col("event_type") != "purchase")
        .join(firstp, "user_id")
        .where(F.col("ts") <= F.col("fp"))
        .select("user_id", "event_type", w.alias("w"))
    )
    per_ut = touches.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_ut"),
        F.sum("w").cast("decimal(38,0)").alias("w_ut"),
    )
    tot = per_ut.groupBy("user_id").agg(F.sum("w_ut").alias("w_u"))
    scale = F.lit(_ATTR_SCALE).cast("decimal(38,0)")
    num = (F.col("w_ut") * scale).cast("decimal(38,0)")
    q_ut = ((num - F.pmod(num, F.col("w_u"))) / F.col("w_u")).cast(
        "decimal(38,0)"
    )
    return (
        per_ut.join(tot, "user_id")
        .select("user_id", "event_type", "n_ut", q_ut.alias("q_ut"))
        .groupBy("event_type")
        .agg(
            F.sum("n_ut").cast("bigint").alias("n_touches"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(
                F.sum("q_ut").cast("double") / F.lit(float(_ATTR_SCALE)), 6
            ).alias("credit"),
        )
    )

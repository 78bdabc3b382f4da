"""Behavioral analytics #2: multi-step funnels and audience overlap.

Extends the analytics family (funnel/retention/attribution/
co-occurrence/paths/rolling actives, ``queries/analytics.py``) with
two staples of product analytics engines:

- ``funnel_three_step``: strict-order three-step funnel
  (view -> click -> purchase), each step within a bounded window of
  the previous step's FIRST occurrence — the n-step generalization of
  ``funnel_view_purchase``. All joins are user-keyed (the time bounds
  filter in place), so the shuffle key is user_id at every step and
  per-step state is one row per user: no event-cross-event blowup at
  any scale.
- ``segment_overlap_jaccard``: pairwise Jaccard similarity between
  the user audiences of each event type — the audience-overlap matrix.
  The user->type incidence is deduplicated FIRST (one row per (user,
  type), shuffle keyed by user), pairs form per-user over a
  schema-bounded type set (<= |types|² per user), and the output is
  |types| x |types| — never user-scaled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

_STEP_WINDOW_H = 2  # each step must follow within 2h of the previous

FUNNEL3_ORACLE = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1
  FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
s2 AS (
  SELECT s1.user_id, MIN(e.ts) AS t2
  FROM s1 JOIN events e
    ON e.user_id = s1.user_id
   AND e.event_type = 'click'
   AND e.ts > s1.t1
   AND e.ts <= s1.t1 + INTERVAL {_STEP_WINDOW_H} HOUR
  GROUP BY s1.user_id
),
s3 AS (
  SELECT s2.user_id
  FROM s2 JOIN events e
    ON e.user_id = s2.user_id
   AND e.event_type = 'purchase'
   AND e.ts > s2.t2
   AND e.ts <= s2.t2 + INTERVAL {_STEP_WINDOW_H} HOUR
  GROUP BY s2.user_id
)
SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_step1,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_step2,
       CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_step3,
       ROUND(CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
             / (SELECT COUNT(*) FROM s1), 4) AS rate_12,
       ROUND(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
             / NULLIF((SELECT COUNT(*) FROM s2), 0), 4) AS rate_23,
       ROUND(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
             / (SELECT COUNT(*) FROM s1), 4) AS rate_13
"""


@register("funnel_three_step", FUNNEL3_ORACLE)
def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order view -> click -> purchase funnel, each step within
    {h}h of the previous step's first occurrence: single row
    (n_step1, n_step2, n_step3, rate_12, rate_23,
    rate_13).""".format(h=_STEP_WINDOW_H)
    events = load_table(spark, sf_dir, "events")
    win = F.expr(f"INTERVAL {_STEP_WINDOW_H} HOUR")
    s1 = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    s2 = (
        s1.join(
            clicks,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") > F.col("t1"))
            & (F.col("c_ts") <= F.col("t1") + win),
        )
        .groupBy("user_id")
        .agg(F.min("c_ts").alias("t2"))
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    s3 = (
        s2.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") > F.col("t2"))
            & (F.col("p_ts") <= F.col("t2") + win),
        )
        .select("user_id")
        .distinct()
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n_step1"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n_step2"))
    n3 = s3.agg(F.count(F.lit(1)).alias("n_step3"))
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
        .select(
            "n_step1",
            "n_step2",
            "n_step3",
            F.round(F.col("n_step2").cast("double") / F.col("n_step1"), 4).alias(
                "rate_12"
            ),
            F.round(
                F.col("n_step3").cast("double")
                / F.nullif(F.col("n_step2"), F.lit(0)),
                4,
            ).alias("rate_23"),
            F.round(F.col("n_step3").cast("double") / F.col("n_step1"), 4).alias(
                "rate_13"
            ),
        )
    )


OVERLAP_ORACLE = """
WITH inc AS (
  SELECT DISTINCT user_id, event_type FROM events
),
sizes AS (
  SELECT event_type, COUNT(*) AS n FROM inc GROUP BY event_type
),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_both
  FROM inc a JOIN inc b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT i.type_a, i.type_b,
       CAST(i.n_both AS BIGINT) AS n_both,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       ROUND(CAST(i.n_both AS DOUBLE) / (sa.n + sb.n - i.n_both), 4)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
"""


@register("segment_overlap_jaccard", OVERLAP_ORACLE)
def segment_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: Jaccard between the user sets of every
    event-type pair: (type_a, type_b, n_both, n_a, n_b, jaccard)."""
    events = load_table(spark, sf_dir, "events")
    inc = events.select("user_id", "event_type").distinct()
    sizes = inc.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = inc.select("user_id", F.col("event_type").alias("type_a"))
    b = inc.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                4,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Point-in-time (as-of state) join against SCD2 intervals
# ---------------------------------------------------------------------------
#
# The feature-store staple: "what was entity X's state at time t" for
# a grid of observation times, answered WITHOUT leakage by joining the
# probe time into the SCD2 validity interval that CONTAINS it. The
# history side is the order_history_scd2 build (one custkey-keyed
# window); probes are a quarterly date grid exploded per tracked
# customer. The join is keyed on custkey with the interval containment
# as an in-place filter — a keyed range join, never time-cross-time.
# At scale the probe grid is |entities| x |grid points| (both chosen),
# and each probe matches exactly one interval by construction
# (intervals partition the timeline from the first order on).

_PIT_KEEP_MOD = 100  # track custkeys % 100 == 0 (the SCD2 demo slice)

PIT_ORACLE = f"""
WITH hist AS (
  SELECT o_custkey,
         ROW_NUMBER() OVER w AS seq,
         o_orderdate AS valid_from,
         COALESCE(LEAD(o_orderdate) OVER w, TIMESTAMP '9999-12-31')
           AS valid_to,
         o_totalprice AS price
  FROM orders
  WHERE o_custkey % {_PIT_KEEP_MOD} = 0
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
probes AS (
  SELECT c.o_custkey, t.t
  FROM (SELECT DISTINCT o_custkey FROM orders
        WHERE o_custkey % {_PIT_KEEP_MOD} = 0) c,
       unnest(generate_series(TIMESTAMP '1995-01-01',
                              TIMESTAMP '2001-07-01',
                              INTERVAL 3 MONTH)) AS t(t)
)
SELECT p.o_custkey,
       strftime(p.t, '%Y-%m-%d') AS as_of,
       CAST(h.seq AS BIGINT) AS seq,
       ROUND(h.price, 2) AS price_at_time
FROM probes p
JOIN hist h
  ON h.o_custkey = p.o_custkey
 AND h.valid_from <= p.t AND p.t < h.valid_to
"""


@register("point_in_time_order_state", PIT_ORACLE)
def point_in_time_order_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: each tracked customer's order state at
    every quarterly grid date: (o_custkey, as_of, seq,
    price_at_time)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    kept = orders.where(F.col("o_custkey") % _PIT_KEEP_MOD == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    hist = kept.select(
        "o_custkey",
        F.row_number().over(w).alias("seq"),
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(w), F.lit("9999-12-31").cast("timestamp")
        ).alias("valid_to"),
        F.col("o_totalprice").alias("price"),
    )
    grid = F.explode(
        F.sequence(
            F.lit("1995-01-01").cast("timestamp"),
            F.lit("2001-07-01").cast("timestamp"),
            F.expr("INTERVAL 3 MONTH"),
        )
    )
    probes = (
        kept.select("o_custkey")
        .distinct()
        .select(F.col("o_custkey").alias("p_custkey"), grid.alias("t"))
    )
    return (
        probes.join(
            hist,
            (F.col("p_custkey") == F.col("o_custkey"))
            & (F.col("valid_from") <= F.col("t"))
            & (F.col("t") < F.col("valid_to")),
        )
        .select(
            "o_custkey",
            F.date_format("t", "yyyy-MM-dd").alias("as_of"),
            F.col("seq").cast("bigint").alias("seq"),
            F.round("price", 2).alias("price_at_time"),
        )
    )


# ---------------------------------------------------------------------------
# Time-to-convert distribution
# ---------------------------------------------------------------------------
#
# The funnel's companion: among converters (first view -> a purchase
# within 24h), the distribution of conversion latency in 30-minute
# buckets. Same user-keyed range-join discipline; the histogram is a
# bounded 48-bucket aggregate.

TTC_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
conv AS (
  SELECT v.user_id,
         MIN(date_diff('minute', v.first_view, e.ts)) AS mins
  FROM v JOIN events e
    ON e.user_id = v.user_id
   AND e.event_type = 'purchase'
   AND e.ts > v.first_view
   AND e.ts <= v.first_view + INTERVAL 24 HOUR
  GROUP BY v.user_id
)
SELECT CAST(FLOOR(mins / 30) AS BIGINT) AS bucket_30m,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(mins) AS BIGINT) AS min_mins,
       CAST(MAX(mins) AS BIGINT) AS max_mins
FROM conv
GROUP BY 1
"""


@register("time_to_convert_histogram", TTC_ORACLE)
def time_to_convert_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency histogram (first view -> fastest purchase
    within 24h), 30-minute buckets: (bucket_30m, n_users, min_mins,
    max_mins)."""
    events = load_table(spark, sf_dir, "events")
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    mins = (
        F.col("p_ts").cast("long") / 60 - F.col("first_view").cast("long") / 60
    )
    conv = (
        v.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") > F.col("first_view"))
            & (F.col("p_ts") <= F.col("first_view") + F.expr("INTERVAL 24 HOUR")),
        )
        .groupBy("user_id")
        .agg(
            F.min(
                (
                    F.floor(F.col("p_ts").cast("long") / 60)
                    - F.floor(F.col("first_view").cast("long") / 60)
                )
            ).alias("mins")
        )
    )
    return (
        conv.groupBy(F.floor(F.col("mins") / 30).cast("bigint").alias("bucket_30m"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("mins").cast("bigint").alias("min_mins"),
            F.max("mins").cast("bigint").alias("max_mins"),
        )
    )


# ---------------------------------------------------------------------------
# Forward as-of join (next-state lookup)
# ---------------------------------------------------------------------------
#
# The mirror of asof_join_latest_order: for each quarterly probe date,
# the EARLIEST order at/after it per tracked customer —
# operators/asof.py asof_join_forward (union + per-key window, one
# shuffle; DuckDB's native ASOF is backward-only, so the oracle uses
# the explicit ranked non-equi form over the bounded probe grid).
# Right-side duplicates at the same (custkey, date) are pre-aggregated
# to the min-orderkey payload per the operator's determinism caveat.

ASOF_FWD_ORACLE = f"""
WITH probes AS (
  SELECT c.o_custkey AS p_custkey, t.t
  FROM (SELECT DISTINCT o_custkey FROM orders
        WHERE o_custkey % {_PIT_KEEP_MOD} = 0) c,
       unnest(generate_series(TIMESTAMP '1995-01-01',
                              TIMESTAMP '2001-07-01',
                              INTERVAL 3 MONTH)) AS t(t)
),
uniq AS (
  SELECT o_custkey, o_orderdate,
         MIN(ROW(o_orderkey, o_totalprice)) AS pay
  FROM orders WHERE o_custkey % {_PIT_KEEP_MOD} = 0
  GROUP BY o_custkey, o_orderdate
),
ranked AS (
  SELECT p.p_custkey, p.t, u.o_orderdate, (u.pay)[2] AS price,
         ROW_NUMBER() OVER (
           PARTITION BY p.p_custkey, p.t
           ORDER BY u.o_orderdate
         ) AS rk
  FROM probes p
  JOIN uniq u
    ON u.o_custkey = p.p_custkey AND u.o_orderdate >= p.t
)
SELECT p.p_custkey AS o_custkey,
       strftime(p.t, '%Y-%m-%d') AS as_of,
       COALESCE(strftime(r.o_orderdate, '%Y-%m-%d'), 'none')
         AS next_order_date,
       ROUND(COALESCE(r.price, -1.0), 2) AS next_price
FROM probes p
LEFT JOIN ranked r
  ON r.p_custkey = p.p_custkey AND r.t = p.t AND r.rk = 1
"""


@register("asof_forward_next_order", ASOF_FWD_ORACLE)
def asof_forward_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each tracked customer's NEXT order at/after every
    quarterly grid date: (o_custkey, as_of, next_order_date,
    next_price) — sentinels for grid dates past the last order."""
    from tfm_semisup_spark.operators.asof import asof_join_forward

    orders = load_table(spark, sf_dir, "orders")
    kept = orders.where(F.col("o_custkey") % _PIT_KEEP_MOD == 0)
    uniq = (
        kept.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.min(F.struct("o_orderkey", "o_totalprice")).alias("pay")
        )
        .select(
            "o_custkey",
            "o_orderdate",
            F.col("pay.o_totalprice").alias("price"),
        )
    )
    probes = (
        kept.select("o_custkey")
        .distinct()
        .select(
            F.col("o_custkey").alias("p_custkey"),
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("timestamp"),
                    F.lit("2001-07-01").cast("timestamp"),
                    F.expr("INTERVAL 3 MONTH"),
                )
            ).alias("t"),
        )
    )
    joined = asof_join_forward(
        probes,
        uniq,
        left_key="p_custkey",
        right_key="o_custkey",
        left_time="t",
        right_time="o_orderdate",
        value_cols=["o_orderdate", "price"],
    )
    return joined.select(
        F.col("p_custkey").alias("o_custkey"),
        F.date_format("t", "yyyy-MM-dd").alias("as_of"),
        F.coalesce(
            F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit("none")
        ).alias("next_order_date"),
        F.round(F.coalesce("price", F.lit(-1.0)), 2).alias("next_price"),
    )

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

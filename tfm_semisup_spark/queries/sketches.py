"""Sketch-based approximate aggregates (the 100 TB tier for distinct
counts and quantiles).

Exact COUNT(DISTINCT) shuffles every (group, value) pair; exact
percentiles sort. At corpus scale the right answers are one-pass,
fixed-size, MERGEABLE summaries:

- HyperLogLog++ (`approx_count_distinct`) — ~2% error from a few KB of
  state per group; map-side partials merge associatively, so the
  shuffle moves sketches, not values.
- Datasketches HLL columns (`hll_sketch_agg` / `hll_union_agg`) — the
  sketch itself is a materializable BINARY column, which is what makes
  *incremental* distinct counting possible: persist per-day sketches,
  union them for any rollup window. You cannot sum distinct counts;
  you CAN union sketches (same pattern as operators/rollup_table.py
  for summable aggregates).
- GK quantile summaries (`percentile_approx`) — bounded-error
  percentiles with mergeable partials.

All three are deterministic for a given dataset (hash-based state,
associative merges — verified under 1/7/32-way repartitioning in
tests/test_sketches.py), so rows-only driver checks are stable. The
exact twins stay available as oracle tiers (`conditional_distinct_users`,
the stats battery's exact percentiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register


@register("sketch_distinct_users_by_type")
def sketch_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct users via HLL++ — the one-pass scale form of
    `conditional_distinct_users` (its exact oracle twin). Accuracy vs
    exact asserted <2% in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .orderBy("event_type")
    )


@register("sketch_value_quantiles")
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p50/p95/p99 of event value via GK summaries
    (`percentile_approx`): bounded-error, mergeable — no per-group
    sort. Accuracy vs exact percentiles asserted in tests.

    Determinism caveat (rows-only contract): GK summary merges are NOT
    guaranteed merge-order-independent (unlike HLL union). The rounded
    output is stable under 1/7/32-way repartition (tested), which
    covers the driver's fixed local parallelism, but a run with
    materially different parallelism could land a rounding boundary
    differently. If the driver ever varies parallelism, demote this
    entry or coarsen the rounding further."""
    ev = load_table(spark, sf_dir, "events")
    q = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(10000)
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(q.getItem(0), 2).alias("p50"),
            F.round(q.getItem(1), 2).alias("p95"),
            F.round(q.getItem(2), 2).alias("p99"),
        )
        .orderBy("event_type")
    )


@register("sketch_incremental_distinct_users")
def sketch_incremental_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct counting via MATERIALIZABLE sketches: build
    one Datasketches-HLL binary per (event_type, day) — the shape a
    rollup table would persist — then union-merge the per-day sketches
    into per-type totals. This is the only correct way to roll distinct
    counts up across partitions/days (distincts don't sum; sketches
    union), and the per-day partials mean a new day's data touches ONE
    partition of the sketch table, exactly like the summable rollup in
    operators/rollup_table.py.

    Estimates equal the direct whole-table sketch (same sketch state
    either way — union is associative), asserted in tests."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_day_sketches"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------
#
# The frequency member of the sketch tier (HLL = distinct, GK =
# quantiles, bloom = membership, CMS = counts): d x w counters, term
# increments one counter per row at position h_j(term), estimate =
# min_j counter[j][h_j(term)] — always an OVERestimate, within
# eps * total with probability 1 - delta. Mergeable by cell-wise sum,
# which is the whole 100 TB point: per-partition sketches union by
# addition, never shipping term strings.
#
# Portable like the bloom screen: the d = 3 row positions are three
# 4-hex slices of ONE md5(term) digest (w = 65536), so both engines
# build bit-identical sketches and agree on every estimate, including
# the collision overestimates. Verified against exact counts for the
# top exact terms.

CMS_D = 3  # hash rows: md5 hex chars 1-4 / 5-8 / 9-12
CMS_TOP = 10

from tfm_semisup_spark.operators.layout import (  # noqa: E402
    md5_uniform16_spark_sql,
    md5_uniform16_sql,
)

_CMS_POS = [md5_uniform16_sql("md5(term)", start=1 + 4 * j) for j in range(CMS_D)]
# Spark-side: value-identical single-reference conv decode
_CMS_POS_SPARK = [
    md5_uniform16_spark_sql("md5(term)", start=1 + 4 * j) for j in range(CMS_D)
]

CMS_ORACLE = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
hashed AS (
  SELECT term, {_CMS_POS[0]} AS p0, {_CMS_POS[1]} AS p1, {_CMS_POS[2]} AS p2
  FROM toks
),
c0 AS (SELECT p0 AS p, COUNT(*)::BIGINT AS c FROM hashed GROUP BY p0),
c1 AS (SELECT p1 AS p, COUNT(*)::BIGINT AS c FROM hashed GROUP BY p1),
c2 AS (SELECT p2 AS p, COUNT(*)::BIGINT AS c FROM hashed GROUP BY p2),
exact AS (
  SELECT term, MIN(p0) AS p0, MIN(p1) AS p1, MIN(p2) AS p2,
         COUNT(*)::BIGINT AS exact_count
  FROM hashed GROUP BY term
  ORDER BY COUNT(*) DESC, term LIMIT {CMS_TOP}
)
SELECT e.term, e.exact_count,
       LEAST(c0.c, c1.c, c2.c) AS est_count,
       (LEAST(c0.c, c1.c, c2.c) - e.exact_count)::BIGINT AS overestimate
FROM exact e
JOIN c0 ON c0.p = e.p0
JOIN c1 ON c1.p = e.p1
JOIN c2 ON c2.p = e.p2
ORDER BY e.exact_count DESC, e.term
"""


@register("cms_heavy_hitters", CMS_ORACLE)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top exact terms with their count-min estimates:
    (term, exact_count, est_count, overestimate >= 0). One hashing
    pass persisted as primitives; d counter aggregates; broadcast
    estimate joins."""
    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.operators.lineage import truncate

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
        ).alias("term")
    )
    # hash once: term + three positions from one digest (cheap ints
    # everywhere downstream); persisted for the d+1 consumers
    hashed = toks.select(
        "term",
        F.expr(_CMS_POS_SPARK[0]).alias("p0"),
        F.expr(_CMS_POS_SPARK[1]).alias("p1"),
        F.expr(_CMS_POS_SPARK[2]).alias("p2"),
    ).persist()
    counters = [
        hashed.groupBy(F.col(f"p{j}").alias("p")).agg(
            F.count(F.lit(1)).alias("c")
        )
        for j in range(CMS_D)
    ]
    exact = (
        hashed.groupBy("term")
        .agg(
            F.min("p0").alias("p0"),
            F.min("p1").alias("p1"),
            F.min("p2").alias("p2"),
            F.count(F.lit(1)).alias("exact_count"),
        )
        .orderBy(F.col("exact_count").desc(), "term")
        .limit(CMS_TOP)
    )
    est = exact
    for j, cdf in enumerate(counters):
        est = est.join(
            F.broadcast(cdf.withColumnRenamed("c", f"c{j}")),
            est[f"p{j}"] == cdf["p"],
        ).drop("p")
    out = truncate(
        est.select(
            "term",
            "exact_count",
            F.least("c0", "c1", "c2").alias("est_count"),
            (F.least("c0", "c1", "c2") - F.col("exact_count")).alias(
                "overestimate"
            ),
        ).orderBy(F.col("exact_count").desc(), "term")
    )
    hashed.unpersist()
    return out

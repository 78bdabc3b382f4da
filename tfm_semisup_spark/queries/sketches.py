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

"""Sketch tier: accuracy bounds vs exact, partitioning-independence
(the determinism contract every rows-only entry must satisfy), and
sketch-union == whole-table-sketch for the incremental pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries.sketches import (
    sketch_distinct_users_by_type,
    sketch_incremental_distinct_users,
    sketch_value_quantiles,
)

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_2pct_of_exact(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in sketch_distinct_users_by_type(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for t in exact:
        assert abs(approx[t] - exact[t]) <= max(2, 0.02 * exact[t]) * 1.5, (
            t,
            approx[t],
            exact[t],
        )


def test_quantile_sketch_close_to_exact(spark):
    got = {r["event_type"]: (r["p50"], r["p95"], r["p99"]) for r in
           sketch_value_quantiles(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    exact_q = F.expr("percentile(value, array(0.5, 0.95, 0.99))")
    exact = {
        r["event_type"]: r["q"]
        for r in ev.groupBy("event_type").agg(exact_q.alias("q")).collect()
    }
    for t, (p50, p95, p99) in got.items():
        e50, e95, e99 = exact[t]
        # GK with accuracy 10000 is rank-exact at this group size; the
        # interpolation difference (exact percentile interpolates,
        # sketch returns a data point) bounds the gap
        assert abs(p50 - e50) / max(e50, 1) < 0.02
        assert abs(p95 - e95) / max(e95, 1) < 0.02
        assert abs(p99 - e99) / max(e99, 1) < 0.02


def test_sketches_partitioning_independent(spark):
    """The rows-only determinism contract: identical output whatever
    the input partitioning (hash-based state, associative merge)."""
    ev = load_table(spark, SF, "events")

    def all_three(df):
        hll = sorted(
            df.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("u"))
            .collect()
        )
        q = F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(10000)
        )
        pct = sorted(
            df.groupBy("event_type").agg(F.round(q.getItem(2), 2).alias("p")).collect()
        )
        ds = sorted(
            df.groupBy("event_type", F.to_date("ts").alias("d"))
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
            .groupBy("event_type")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u"))
            .collect()
        )
        return hll, pct, ds

    base = all_three(ev.repartition(1))
    assert all_three(ev.repartition(7)) == base
    assert all_three(ev.repartition(32)) == base


def test_daily_sketch_union_equals_whole_table_sketch(spark):
    """Union of per-day sketches == one whole-table sketch — the
    property that makes the incremental distinct rollup CORRECT, not
    just approximately right."""
    merged = {
        r["event_type"]: r["approx_users"]
        for r in sketch_incremental_distinct_users(spark, SF).collect()
    }
    whole = {
        r["event_type"]: r["u"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("u"))
        .collect()
    }
    assert merged == whole

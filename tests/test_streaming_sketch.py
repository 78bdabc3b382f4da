"""Streaming CMS maintenance: split the feed, merge twice, counters
must equal one full recompute (mergeability); replaying a batch id is
a no-op (idempotence — foreachBatch is at-least-once); a true
readStream pass agrees with batch; compaction preserves the merged
counters; estimates upper-bound exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.streaming.sketch import (
    batch_counter_deltas,
    cms_estimate,
    cms_refresh,
    compact_counters,
    read_counters,
    stream_cms_sink,
)

SF = "/root/testdata/sf0.001"


def _counters(spark, path):
    return sorted(
        (r["row"], r["p"], r["c"]) for r in read_counters(spark, path).collect()
    )


def test_two_batch_merge_equals_full_recompute(spark, tmp_path):
    events = load_table(spark, SF, "events")
    cutoff = "2024-01-20"
    path = str(tmp_path / "cms")
    cms_refresh(spark, events.where(F.col("ts") < cutoff), path, batch_id=0)
    cms_refresh(spark, events.where(F.col("ts") >= cutoff), path, batch_id=1)

    full_path = str(tmp_path / "cms_full")
    cms_refresh(spark, events, full_path, batch_id=0)
    assert _counters(spark, path) == _counters(spark, full_path)


def test_replaying_a_batch_id_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-applying the SAME batch under
    the SAME id must not double-count (per-batch partition overwrite)."""
    events = load_table(spark, SF, "events")
    cutoff = "2024-01-20"
    early = events.where(F.col("ts") < cutoff)
    path = str(tmp_path / "cms")
    cms_refresh(spark, early, path, batch_id=0)
    cms_refresh(spark, events.where(F.col("ts") >= cutoff), path, batch_id=1)
    before = _counters(spark, path)
    cms_refresh(spark, early, path, batch_id=0)  # crash-replay of batch 0
    assert _counters(spark, path) == before


def test_stream_drain_matches_batch(spark, tmp_path):
    from tfm_semisup_spark.streaming.events import read_events_stream

    stream = read_events_stream(spark, SF)
    path = str(tmp_path / "cms_stream")
    q = stream_cms_sink(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination()

    batch_path = str(tmp_path / "cms_batch")
    cms_refresh(spark, load_table(spark, SF, "events"), batch_path, batch_id=0)
    assert _counters(spark, path) == _counters(spark, batch_path)


def test_compaction_preserves_merged_counters(spark, tmp_path):
    events = load_table(spark, SF, "events")
    cutoff = "2024-01-20"
    path = str(tmp_path / "cms")
    cms_refresh(spark, events.where(F.col("ts") < cutoff), path, batch_id=0)
    cms_refresh(spark, events.where(F.col("ts") >= cutoff), path, batch_id=1)
    before = _counters(spark, path)
    compact_counters(spark, path)
    assert _counters(spark, path) == before
    # history folded into one partition
    parts = spark.read.parquet(path).select("batch_id").distinct().collect()
    assert [r["batch_id"] for r in parts] == [-1]


def test_estimates_upper_bound_exact_counts(spark, tmp_path):
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "cms")
    cms_refresh(spark, events, path, batch_id=0)

    term = F.get_json_object("props", "$.k")
    exact = (
        events.where(term.isNotNull())
        .groupBy(term.alias("term"))
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    est = cms_estimate(spark, path, exact.select("term"))
    joined = exact.join(est, "term").collect()
    assert len(joined) > 0
    assert all(r["est_count"] >= r["exact"] for r in joined)


def test_delta_shape_single_pass(spark):
    events = load_table(spark, SF, "events")
    delta = batch_counter_deltas(events)
    rows = delta.groupBy("row").agg(F.sum("c").alias("total")).collect()
    n = events.where(F.get_json_object("props", "$.k").isNotNull()).count()
    # every hash row receives exactly one increment per event
    assert sorted(r["row"] for r in rows) == [0, 1, 2]
    assert all(r["total"] == n for r in rows)
    # one hashing pass: the d position rows come from ONE projection +
    # explode, not a unionAll that re-executes the scan per hash row
    # (plan-TEXT expression counts are not asserted — codegen CSE
    # collapses repeated subexpressions at runtime)
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert plan.count("Scan parquet") == 1

def test_never_created_table_reads_as_empty_sketch(spark, tmp_path):
    """A counter table no batch ever wrote (or whose batches all had
    zero matching terms — dynamic overwrite writes NO partitions then)
    is an empty sketch: every estimate 0, compaction a no-op. A read
    failure on an EXISTING path must still raise (FS existence probe,
    not a blanket except)."""
    import os

    path = str(tmp_path / "cms_never")
    assert read_counters(spark, path).count() == 0
    compact_counters(spark, path)  # no-op, must not create the path
    assert not os.path.exists(path)

    terms = spark.createDataFrame([("a",), ("b",)], "term STRING")
    est = {r["term"]: r["est_count"] for r in cms_estimate(spark, path, terms).collect()}
    assert est == {"a": 0, "b": 0}

    # the zero-matching-terms refresh itself leaves the table absent
    events = load_table(spark, SF, "events")
    none = events.where(F.get_json_object("props", "$.k").isNull()).limit(0)
    cms_refresh(spark, none, path, batch_id=0)
    assert read_counters(spark, path).count() == 0

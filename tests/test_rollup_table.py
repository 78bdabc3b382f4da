"""Incremental day-rollup: split feed in two, refresh twice, end state
must equal a single full recompute; untouched partitions not rewritten."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.rollup_table import (
    _aggregate,
    full_refresh,
    incremental_refresh,
    read_rollup,
)

SF = "/root/testdata/sf0.001"


def _normalized(df):
    # serving-layer rounding: the materialized table stores full-precision
    # decomposable sums; presentation rounds (ADVICE r1)
    return sorted(
        (str(r["day"])[:10], r["event_type"], r["n"], round(r["sum_value"], 2))
        for r in df.collect()
    )


def test_incremental_equals_full_recompute(spark, tmp_path):
    events = load_table(spark, SF, "events")
    cutoff = "2024-01-20"
    early = events.where(F.col("ts") < cutoff)
    late = events.where(F.col("ts") >= cutoff)
    path = str(tmp_path / "rollup")

    n1 = incremental_refresh(spark, early, path)  # bootstrap
    assert n1 > 0
    snapshot_after_first = _normalized(read_rollup(spark, path))

    n2 = incremental_refresh(spark, late, path)
    assert n2 > 0

    expected = _normalized(_aggregate(events))
    assert _normalized(read_rollup(spark, path)) == expected

    # days fully before the cutoff were not touched by the second refresh
    early_days = {d for d, *_ in snapshot_after_first if d < "2024-01-20"}
    final_days = {d for d, *_ in _normalized(read_rollup(spark, path))}
    assert early_days <= final_days

    # full_refresh agrees too
    path2 = str(tmp_path / "rollup_full")
    full_refresh(events, path2)
    assert _normalized(read_rollup(spark, path2)) == expected


def test_incremental_noop_on_empty_delta(spark, tmp_path):
    events = load_table(spark, SF, "events")
    path = str(tmp_path / "rollup")
    full_refresh(events, path)
    n = incremental_refresh(spark, events.where(F.lit(False)), path)
    assert n == 0
    assert _normalized(read_rollup(spark, path)) == _normalized(_aggregate(events))


def test_incremental_exact_with_fine_precision_values(spark, tmp_path):
    """Sums finer than 2dp: incremental refreshes must still equal a full
    recompute because partials are stored UNROUNDED (rounding partials
    would drift up to 0.005 per refresh)."""
    events = load_table(spark, SF, "events").withColumn(
        "value", F.col("value") / F.lit(7.0)  # values now have >2dp
    )
    cutoff = "2024-01-20"
    path = str(tmp_path / "rollup")
    incremental_refresh(spark, events.where(F.col("ts") < cutoff), path)
    incremental_refresh(spark, events.where(F.col("ts") >= cutoff), path)
    assert _normalized(read_rollup(spark, path)) == _normalized(_aggregate(events))


def test_read_failure_on_existing_rollup_raises(spark, tmp_path):
    """A corrupt EXISTING rollup must raise, not silently bootstrap and
    overwrite affected day partitions with delta-only aggregates."""
    import pytest

    events = load_table(spark, SF, "events")
    path = tmp_path / "rollup"
    path.mkdir()
    (path / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        incremental_refresh(spark, events, str(path))
    # the garbage is still there — nothing was overwritten
    assert (path / "part-00000.parquet").read_bytes() == b"this is not parquet"


def test_stream_rollup_sink_converges_to_full_recompute(spark, tmp_path):
    """Streaming continuous aggregate: two micro-batches (one file each)
    through foreachBatch+incremental_refresh must equal the batch
    full-recompute rollup."""
    from tfm_semisup_spark.streaming.events import stream_rollup_sink

    events = load_table(spark, SF, "events")
    cutoff = "2024-01-20"
    src = str(tmp_path / "src")
    events.where(F.col("ts") < cutoff).coalesce(1).write.parquet(f"{src}/part1")
    events.where(F.col("ts") >= cutoff).coalesce(1).write.parquet(f"{src}/part2")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/part*")
    )
    rollup = str(tmp_path / "rollup")
    q = stream_rollup_sink(stream, rollup, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert len(q.recentProgress) >= 2, "expected one micro-batch per file"
    assert _normalized(read_rollup(spark, rollup)) == _normalized(_aggregate(events))

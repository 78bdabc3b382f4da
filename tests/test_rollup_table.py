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
    return sorted(
        (str(r["day"])[:10], r["event_type"], r["n"], r["sum_value"])
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

"""True streaming smoke (VERDICT r1 #7): run streaming/events.py under
readStream with a memory sink and assert micro-batch output equals the
batch queries — not just expression-level equivalence.

Complete output mode is used for the equality checks so every window is
emitted regardless of watermark position; the append-mode finalization
path is covered by test_streaming_sessions.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries.windows import session_window_30m, tumbling_window_hourly
from tfm_semisup_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    session_counts_stream,
    tumbling_counts_stream,
)

SF = "/root/testdata/sf0.001"


def test_tumbling_stream_equals_batch_query(spark):
    stream = read_events_stream(spark, SF)
    assert stream.isStreaming
    run_available_now(tumbling_counts_stream(stream), "smoke_tumbling")
    streamed = {
        (str(r["window_start"])[:19], r["n"], r["sum_value"])
        for r in spark.table("smoke_tumbling").collect()
    }
    batch = {
        (r["window_start"], r["n"], r["sum_value"])
        for r in tumbling_window_hourly(spark, SF).collect()
    }
    assert streamed == batch


def test_tumbling_multi_microbatch_equals_batch(spark, tmp_path):
    """Two time-split files consumed one per micro-batch: the completed
    stream must converge to the batch answer across batch boundaries."""
    events = load_table(spark, SF, "events")
    cutoff = "2024-01-15"
    src = str(tmp_path / "src")
    events.where(F.col("ts") < cutoff).coalesce(1).write.parquet(f"{src}/part1")
    events.where(F.col("ts") >= cutoff).coalesce(1).write.parquet(f"{src}/part2")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/part*")
    )
    q = run_available_now(tumbling_counts_stream(stream), "smoke_tumbling_mb")
    assert len(q.recentProgress) >= 2, "expected multiple micro-batches"
    streamed = {
        (str(r["window_start"])[:19], r["n"], r["sum_value"])
        for r in spark.table("smoke_tumbling_mb").collect()
    }
    batch = {
        (r["window_start"], r["n"], r["sum_value"])
        for r in tumbling_window_hourly(spark, SF).collect()
    }
    assert streamed == batch


def test_session_stream_equals_batch_sessionization(spark):
    stream = read_events_stream(spark, SF)
    run_available_now(session_counts_stream(stream), "smoke_sessions")
    streamed = spark.table("smoke_sessions")
    # roll per-session rows up to the per-user shape of the oracled query
    per_user = {
        (r["user_id"], r["n_sessions"], r["n_events"])
        for r in streamed.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .collect()
    }
    batch = {
        (r["user_id"], r["n_sessions"], r["n_events"])
        for r in session_window_30m(spark, SF).collect()
    }
    assert per_user == batch

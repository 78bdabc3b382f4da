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


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream interval join (clicks ⨝ errors per user within 10
    minutes): append-mode matches across micro-batch boundaries — the
    buffered-state path — must equal the static range join."""
    from tfm_semisup_spark.streaming.events import interval_join_stream

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
    joined = interval_join_stream(
        stream.where(F.col("event_type") == "click"),
        stream.where(F.col("event_type") == "error"),
    )
    q = run_available_now(joined, "smoke_interval_join", output_mode="append")
    assert len(q.recentProgress) >= 2
    streamed = {
        (r["l_event"], r["r_event"]) for r in spark.table("smoke_interval_join").collect()
    }

    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_event"),
        F.col("ts").alias("l_ts"),
    )
    errors = events.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_event"),
        F.col("ts").alias("r_ts"),
    )
    batch = {
        (r["l_event"], r["r_event"])
        for r in clicks.join(
            errors,
            F.expr(
                "l_user = r_user AND r_ts > l_ts AND r_ts <= l_ts + interval 10 minutes"
            ),
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_quality_gate_stream_equals_batch(spark):
    """streaming/quality.py: the ingest quality gate keeps EXACTLY the
    docs the batch rule chain passes — one rule definition, two
    execution modes — and appends no streaming state (no watermark
    needed for append mode)."""
    from tfm_semisup_spark.operators.quality import filter_quality_gopher
    from tfm_semisup_spark.streaming.quality import stream_quality_filter

    docs = load_table(spark, SF, "documents")
    schema = docs.schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        SF + "/documents.parque*"
    )
    run_available_now(
        stream_quality_filter(stream), "q_gate", output_mode="append"
    )
    got = {r["doc_id"] for r in spark.table("q_gate").collect()}
    want = {r["doc_id"] for r in filter_quality_gopher(docs).collect()}
    assert got == want and len(want) > 0


def test_streaming_tumbling_finalized_is_deterministic(spark):
    """The oracled streaming tier (r5): two independent micro-batch
    runs (fresh temp dirs + checkpoints each) produce identical rows,
    the artifact carries a batch_id audit column, and the emitted set
    is exactly the batch windows the terminal watermark closed."""
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    fn = QUERIES["streaming_tumbling_finalized"]
    first = {tuple(r) for r in fn(spark, SF).collect()}
    second = {tuple(r) for r in fn(spark, SF).collect()}
    assert first == second and len(first) > 0

    # subset of the full batch tumbling aggregate: same (key, n, sum)
    batch = {
        (r["window_start"], r["n"], r["sum_value"])
        for r in tumbling_window_hourly(spark, SF).collect()
    }
    assert first < batch  # strictly: the open tail windows are held back


def test_streaming_sessions_finalized_subset_of_batch(spark):
    """The stateful streaming tier (r5): deterministic across runs and
    a subset of the batch gaps-and-islands sessionization (open-tail
    sessions held back by the watermark)."""
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    fn = QUERIES["streaming_sessions_finalized"]
    first = {tuple(r) for r in fn(spark, SF).collect()}
    second = {tuple(r) for r in fn(spark, SF).collect()}
    assert first == second and len(first) > 0
    # total finalized events never exceed the batch per-user totals
    batch = {
        r["user_id"]: r["n_events"]
        for r in session_window_30m(spark, SF).collect()
    }
    finalized = {}
    for u, _, n in first:
        finalized[u] = finalized.get(u, 0) + n
    for u, n in finalized.items():
        assert n <= batch[u]

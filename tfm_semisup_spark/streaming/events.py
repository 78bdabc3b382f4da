"""Streaming event pipelines: file-source stream over the events table,
watermarked window aggregations, and a custom stateful operator via
``applyInPandasWithState``.

Scale design: watermarks bound state (late data beyond the watermark is
dropped, so state size is O(active windows x keys), not O(history));
the stateful per-user counter keys state by user_id so it shards across
executors; ``trigger(availableNow=True)`` gives deterministic
batch-equivalent runs for tests and backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet. Like the batch loader
    (io._load_events), handles both ts encodings the testdata has
    shipped with: TIMESTAMP(NANOS) (read ns as long via the legacy
    conf, truncate to us) or native TIMESTAMP(MICROS) (pass through)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source rejects a literal single-file path ("basePath must
    # be a directory"); a glob pattern routes through directory-listing
    # semantics and accepts it
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parque*")
    ts_type = dict(stream.dtypes)["ts"]
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # watermarks require TIMESTAMP (LTZ); same instant under UTC
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation — same expression as the
    batch query `tumbling_window_hourly`. Pass ``slide`` for sliding
    windows (each event lands in window/slide buckets; the batch twin
    is `sliding_window_2h_1h`)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked session windows per user (append mode emits sessions
    once finalized past the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


_STATE_SCHEMA = StructType([StructField("total", LongType())])
_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("batch_events", LongType()),
        StructField("total_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def running_user_counts_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event totals via
    applyInPandasWithState (the PySpark stateful-processing hook; state
    is a single long per user, partitioned by the grouping key)."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        batch = 0
        last_ts = None
        for pdf in pdfs:
            batch += len(pdf)
            ts_max = pdf["ts"].max()
            last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
        (total,) = state.get if state.exists else (0,)
        total += batch
        state.update((total,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "batch_events": [batch],
                "total_events": [total],
                "last_ts": [last_ts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    interval: str = "10 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream INTERVAL join: pair each left event with right
    events of the SAME USER within ``interval`` after it (the batch
    twin is the range-join shape of `range_join_event_pairs`).

    Scale design: watermarks on BOTH inputs plus the two-sided time
    bound are what let Spark evict buffered rows — without them a
    stream-stream join must keep every row forever. State is
    O(events inside the watermark horizon), keyed by user so it
    shards across executors; matches emit append-mode once the
    watermark passes their window.

    ``how="leftOuter"`` adds the null-completion semantics: a left row
    with NO match emits once — with NULL right columns — when the
    watermark passes the end of its join window (i.e. at state
    eviction). That timing means outer rows near the stream's end are
    only emitted up to the FINAL watermark (max event time − delay,
    advanced by the trailing no-data micro-batch); consumers comparing
    against batch must clamp both sides to a horizon safely inside it
    (the finalized-window discipline of the session/sliding tiers).
    """
    l = left.withWatermark("ts", watermark).select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_event"),
        F.col("ts").alias("l_ts"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_event"),
        F.col("ts").alias("r_ts"),
    )
    return l.join(
        r,
        F.expr(
            f"""
            l_user = r_user AND
            r_ts > l_ts AND
            r_ts <= l_ts + interval {interval}
            """
        ),
        how,
    ).select("l_user", "l_event", "r_user", "r_event", "l_ts", "r_ts")


def run_available_now(result: DataFrame, table_name: str, output_mode: str = "complete"):
    """Drain the stream deterministically into an in-memory table
    (tests/backfills); returns the finished StreamingQuery."""
    query = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def materialize_stream_to_parquet(
    result: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """``foreachBatch`` parquet sink: each micro-batch's rows land as
    parquet files tagged with the micro-batch id. In APPEND mode
    (default) rows are emitted exactly once per key (the watermark
    finalizes a window before it is released), so a plain file append
    is idempotent under the checkpoint's replay guarantee — a replayed
    batch id rewrites identical rows, and the batch_id column makes
    any at-least-once duplication auditable. UPDATE mode (stateful
    operators like applyInPandasWithState) re-emits a key per batch
    that touches it — readers wanting current state take the row with
    the max batch_id per key (trivially every row under a single
    availableNow data batch). Returns the finished StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    query = (
        result.writeStream.foreachBatch(_sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def stream_rollup_sink(
    events: DataFrame, rollup_path: str, checkpoint_dir: str
):
    """Continuous-aggregate maintenance: stream micro-batches into the
    hypertable-style day rollup via ``foreachBatch`` +
    ``incremental_refresh`` (operators/rollup_table.py). Each
    micro-batch touches only its affected day partitions (dynamic
    partition overwrite); the checkpoint gives exactly-once batch
    replay, and count/sum partials are decomposable, so the
    materialized table converges to the full-recompute answer
    regardless of how events are split across micro-batches.

    Returns the started StreamingQuery (availableNow trigger — drains
    what is present, then stops; call awaitTermination()).
    """
    from tfm_semisup_spark.operators.rollup_table import incremental_refresh

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        incremental_refresh(batch_df.sparkSession, batch_df, rollup_path)

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cdc_latest_wins_merge_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    ckpt_dir: str,
    schema,
) -> None:
    """Streaming CDC apply: maintain a per-user LATEST-STATE table by
    merging each micro-batch into a parquet state dir via foreachBatch
    (``maxFilesPerTrigger=1`` + availableNow — one micro-batch per
    source file, a real multi-batch incremental run).

    The merge rule is latest-wins keyed by (ts, event_id): per batch,
    reduce to each user's max struct, union with the previous state,
    and take the max struct again. ``max`` is ASSOCIATIVE, COMMUTATIVE
    and IDEMPOTENT, so the final state is independent of micro-batch
    ORDER (file listing order is not contractual) and unchanged under
    at-least-once batch REPLAY — the two failure modes a sequential
    "overwrite with newest batch" CDC apply gets wrong. State swap is
    write-new-then-rename, so a crash mid-batch leaves the previous
    state intact (the checkpoint re-runs the batch; replay is a no-op
    by idempotence).

    100 TB: state is one row per key; the merge is one key shuffle of
    |batch keys| + |state keys| rows per batch. On a real lakehouse the
    same logic rides MERGE INTO; this is the engine-level form.
    """
    import os
    import shutil

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        latest = batch_df.groupBy("user_id").agg(
            F.max(F.struct("ts", "event_id", "value")).alias("s")
        )
        if os.path.exists(state_dir):
            old = batch_df.sparkSession.read.parquet(state_dir).select(
                "user_id", F.struct("ts", "event_id", "value").alias("s")
            )
            merged = (
                old.unionByName(latest)
                .groupBy("user_id")
                .agg(F.max("s").alias("s"))
            )
        else:
            merged = latest
        out = merged.select(
            "user_id",
            F.col("s.ts").alias("ts"),
            F.col("s.event_id").alias("event_id"),
            F.col("s.value").alias("value"),
        )
        tmp = state_dir + "_next"
        out.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(state_dir, ignore_errors=True)
        os.rename(tmp, state_dir)

    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

"""Streaming session windows in APPEND mode across micro-batches:
sessions are emitted once the watermark passes their end. Source is the
events table split into two time-ordered files consumed one per
micro-batch (maxFilesPerTrigger=1), so the second batch's watermark
finalizes the first batch's sessions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_session_append_mode_emits_finalized_sessions(spark, tmp_path):
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
    sessions = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("start"), "n_events")
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = {
        (r["user_id"], str(r["start"])[:19], r["n_events"])
        for r in spark.table("sess_append").collect()
    }
    assert emitted, "no sessions finalized despite watermark advancing"

    # every emitted session must match the batch sessionization exactly
    batch = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("start"), "n_events")
    )
    batch_set = {
        (r["user_id"], str(r["start"])[:19], r["n_events"]) for r in batch.collect()
    }
    assert emitted <= batch_set
    # only sessions ending after the final watermark may be missing
    missing = batch_set - emitted
    final_wm = max(r[1] for r in emitted)
    assert all(s[1] >= "2024-01-14" for s in missing), (final_wm, sorted(missing)[:5])

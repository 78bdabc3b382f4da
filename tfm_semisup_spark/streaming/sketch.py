"""Streaming count-min sketch maintenance.

The batch CMS (queries/sketches.py::cms_heavy_hitters) exists because
counters at fixed positions are MERGEABLE BY ADDITION — and this
module is that property made operational: micro-batches stream their
per-batch counter deltas into a materialized d x w counter table via
``foreachBatch``, exactly the continuous-aggregate discipline of
``stream_rollup_sink``. The sketch converges to the full-recompute
counters regardless of how the stream is split into batches (sum is
associative/commutative), giving approximate heavy-hitter counts over
an unbounded stream in O(d x w) state — no per-term state at all,
which is the whole point at 100 TB/day ingest.

Counter layout: (row, p, c) partitioned by ``row`` (d partitions);
refresh touches all d partitions but the table is tiny (d x 65536
upper bound), so dynamic partition overwrite is cosmetic here — the
pattern is kept identical to rollup_table for consistency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.queries.sketches import CMS_D, _CMS_POS


def batch_counter_deltas(batch: DataFrame) -> DataFrame:
    """(row, p, c) counter increments for one batch of events: term =
    the engaged item id (props.k), positions = the same md5 slices as
    the batch CMS."""
    term = F.get_json_object("props", "$.k")
    hashed = batch.where(term.isNotNull()).select(
        term.alias("term")
    ).select(
        *[F.expr(_CMS_POS[j]).alias(f"p{j}") for j in range(CMS_D)]
    )
    long_form = None
    for j in range(CMS_D):
        part = hashed.select(
            F.lit(j).alias("row"), F.col(f"p{j}").alias("p")
        )
        long_form = part if long_form is None else long_form.unionAll(part)
    return long_form.groupBy("row", "p").agg(F.count(F.lit(1)).alias("c"))


def cms_refresh(spark: SparkSession, batch: DataFrame, counters_path: str) -> None:
    """Merge one batch's deltas into the materialized counter table
    (cell-wise sum — the CMS merge operation)."""
    delta = batch_counter_deltas(batch)
    try:
        existing = spark.read.parquet(counters_path).select("row", "p", "c")
        merged_input = existing.unionAll(delta)
    except Exception:  # first refresh: nothing materialized yet
        merged_input = delta
    merged = merged_input.groupBy("row", "p").agg(F.sum("c").alias("c"))
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("row").parquet(counters_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)


def stream_cms_sink(events: DataFrame, counters_path: str, checkpoint_dir: str):
    """Maintain the CMS counter table from a stream: foreachBatch ->
    cms_refresh, availableNow trigger (drains present data then
    stops; call awaitTermination())."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        cms_refresh(batch_df.sparkSession, batch_df, counters_path)

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cms_estimate(spark: SparkSession, counters_path: str, terms: DataFrame) -> DataFrame:
    """(term, est_count) for a DataFrame of candidate ``term`` strings:
    min over the d counters at the term's positions (0 when a position
    was never incremented). The counter table is broadcast — it is
    bounded by d x 65536 cells regardless of stream volume."""
    counters = spark.read.parquet(counters_path)
    est = terms.select(
        "term",
        *[F.expr(_CMS_POS[j]).alias(f"p{j}") for j in range(CMS_D)],
    )
    for j in range(CMS_D):
        cj = counters.where(F.col("row") == j).select(
            F.col("p").alias(f"p{j}"), F.col("c").alias(f"c{j}")
        )
        est = est.join(F.broadcast(cj), f"p{j}", "left")
    return est.select(
        "term",
        F.least(
            *[F.coalesce(F.col(f"c{j}"), F.lit(0)) for j in range(CMS_D)]
        ).alias("est_count"),
    )

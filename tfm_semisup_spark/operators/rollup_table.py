"""Hypertable-style continuous aggregate: a day-bucketed rollup table
maintained INCREMENTALLY — only days touched by new data are
recomputed, everything else is reused from the materialized table.

Batch-parquet formulation of the TimescaleDB/Druid pattern:
- the rollup is partitioned by `day`, so refreshes use dynamic
  partition overwrite (replace ONLY affected day directories);
- the refresh reads just `events where ts >= min(new days)` — with a
  date-partitioned source this prunes to the tail partitions;
- readers always see day-level aggregates without scanning raw events.

At 100 TB of events this turns the daily dashboard query from a full
scan into a read of O(days x event_types) rollup rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_KEYS = ("day", "event_type")


def _aggregate(events: DataFrame) -> DataFrame:
    # sums are stored at FULL double precision: the materialized table
    # holds decomposable partials that get re-aggregated on every
    # incremental merge, and rounding partials would accumulate up to
    # 0.005 error per refresh. Presentation rounding belongs in the
    # serving query (queries/windows.py:daily_rollup_by_type).
    return (
        events.groupBy(
            F.date_trunc("day", "ts").alias("day"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
    )


def _rollup_exists(spark: SparkSession, rollup_path: str) -> bool:
    """Explicit existence probe via the Hadoop FileSystem API (works for
    file://, hdfs://, s3a://...). A probe keeps 'first refresh' distinct
    from 'read failed': a transient/corruption error on an EXISTING
    rollup must propagate, never silently degrade to delta-only output."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(rollup_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(path))


def full_refresh(events: DataFrame, rollup_path: str) -> None:
    _aggregate(events).write.mode("overwrite").partitionBy("day").parquet(rollup_path)


def incremental_refresh(
    spark: SparkSession, new_events: DataFrame, rollup_path: str
) -> int:
    """Merge new events into the rollup; returns #days refreshed.

    Affected days are recomputed from the union of their existing
    rollup rows and the new deltas (aggregates here are decomposable:
    count/sum re-aggregate exactly). Uses dynamic partition overwrite
    so untouched day partitions are never rewritten.
    """
    delta = _aggregate(new_events)
    affected_days = [r["day"] for r in delta.select("day").distinct().collect()]
    if not affected_days:
        return 0

    if _rollup_exists(spark, rollup_path):
        existing = spark.read.parquet(rollup_path).where(
            F.col("day").isin(affected_days)
        )
        merged_input = existing.select("day", "event_type", "n", "sum_value").unionAll(
            delta
        )
    else:  # first refresh: nothing materialized yet
        merged_input = delta

    merged = (
        merged_input.groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("day").parquet(rollup_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return len(affected_days)


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return spark.read.parquet(rollup_path)

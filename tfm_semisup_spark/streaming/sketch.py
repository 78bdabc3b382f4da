"""Streaming count-min sketch maintenance.

The batch CMS (queries/sketches.py::cms_heavy_hitters) exists because
counters at fixed positions are MERGEABLE BY ADDITION — and this
module is that property made operational: micro-batches stream their
per-batch counter deltas into a materialized counter table via
``foreachBatch``, the continuous-aggregate discipline of
``stream_rollup_sink``. The sketch converges to the full-recompute
counters regardless of how the stream is split into batches (sum is
associative/commutative), giving approximate heavy-hitter counts over
an unbounded stream with NO per-term state — the whole point at
100 TB/day ingest.

Exactly-once without transactions: the counter table stores PER-BATCH
DELTAS partitioned by ``batch_id``; applying a batch is a dynamic
partition overwrite of ITS OWN partition, so foreachBatch's
at-least-once replay (crash after the parquet commit, before the
streaming checkpoint records the batch) rewrites the same partition
with the same content instead of double-counting — refresh is
IDEMPOTENT per batch id, with no meta-file ordering window. Reads sum
across partitions (cell-wise sum IS the CMS merge); each partition is
bounded by d x 65536 cells, and a periodic ``compact_counters`` folds
history into one partition (itself idempotent to re-run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.queries.sketches import CMS_D, _CMS_POS_SPARK

#: reserved batch_id partition that compaction folds history into;
#: real stream batch ids are >= 0
COMPACTED_BATCH_ID = -1


def batch_counter_deltas(batch: DataFrame) -> DataFrame:
    """(row, p, c) counter increments for one batch of events: term =
    the engaged item id (props.k), positions = the same md5 slices as
    the batch CMS. ONE hashing pass: the d (row, position) pairs are
    exploded from a single projection, not re-derived per row index."""
    term = F.get_json_object("props", "$.k")
    hashed = batch.where(term.isNotNull()).select(term.alias("term")).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.expr(_CMS_POS_SPARK[j]).alias("p"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("rp")
    )
    return (
        hashed.select(F.col("rp.row").alias("row"), F.col("rp.p").alias("p"))
        .groupBy("row", "p")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_refresh(
    spark: SparkSession, batch: DataFrame, counters_path: str, batch_id: int = 0
) -> None:
    """Apply one batch's deltas as partition ``batch_id`` of the
    counter table. Idempotent: re-running the same (batch, batch_id)
    overwrites that partition with identical content."""
    delta = batch_counter_deltas(batch).withColumn("batch_id", F.lit(int(batch_id)))
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        delta.write.mode("overwrite").partitionBy("batch_id").parquet(counters_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)


def _counters_exist(spark: SparkSession, counters_path: str) -> bool:
    """Hadoop FS existence probe (the rollup_table discipline): a table
    that was NEVER created — e.g. every batch so far had no matching
    terms, so dynamic partition overwrite wrote no partitions — must
    read as an empty sketch, while a read failure on an EXISTING table
    must still propagate."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(counters_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(path))


def read_counters(spark: SparkSession, counters_path: str) -> DataFrame:
    """Merged (row, p, c) counters — cell-wise sum over every stored
    batch partition (the CMS merge operation). A never-created table is
    an empty sketch (every estimate 0), not an error."""
    if not _counters_exist(spark, counters_path):
        return spark.createDataFrame([], "row INT, p INT, c BIGINT")
    # explicit schema: an all-empty-batch table is a directory with no
    # data files, on which schema INFERENCE would fail; partition
    # discovery still supplies batch_id values where files exist
    return (
        spark.read.schema("row INT, p INT, c BIGINT, batch_id INT")
        .parquet(counters_path)
        .drop("batch_id")
        .groupBy("row", "p")
        .agg(F.sum("c").alias("c"))
    )


def compact_counters(spark: SparkSession, counters_path: str) -> None:
    """Fold all stored partitions into the single COMPACTED_BATCH_ID
    partition, bounding table size at d x 65536 rows + one partition
    per batch since the last compaction. Static overwrite of the whole
    table with the (materialized) merged counters — idempotent to
    re-run, but NOT crash-atomic (overwrite deletes before it commits);
    schedule it from ONE maintenance job and rely on the per-batch
    deltas staying replayable if it ever has to be rebuilt."""
    if not _counters_exist(spark, counters_path):
        # nothing to fold; writing an empty table would leave an
        # existing-but-schemaless path behind
        return
    merged = read_counters(spark, counters_path).withColumn(
        "batch_id", F.lit(COMPACTED_BATCH_ID)
    )
    rows = merged.collect()  # bounded: <= d x 65536 cells
    out = spark.createDataFrame(rows, merged.schema)
    out.write.mode("overwrite").partitionBy("batch_id").parquet(counters_path)


def stream_cms_sink(events: DataFrame, counters_path: str, checkpoint_dir: str):
    """Maintain the CMS counter table from a stream: foreachBatch ->
    cms_refresh keyed by the micro-batch id (replay-idempotent),
    availableNow trigger (drains present data then stops; call
    awaitTermination())."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        cms_refresh(batch_df.sparkSession, batch_df, counters_path, batch_id)

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cms_estimate(spark: SparkSession, counters_path: str, terms: DataFrame) -> DataFrame:
    """(term, est_count) for a DataFrame of candidate ``term`` strings:
    min over the d counters at the term's positions (0 when a position
    was never incremented). The merged counter table is broadcast — it
    is bounded by d x 65536 cells regardless of stream volume."""
    counters = read_counters(spark, counters_path)
    est = terms.select(
        "term",
        *[F.expr(_CMS_POS_SPARK[j]).alias(f"p{j}") for j in range(CMS_D)],
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

"""AQE skew-join handling: with a pathologically hot key, adaptive
execution splits the skewed partition (plan marks the join skew=true).
Complements the manual salted_join — at 100 TB, AQE covers moderate
skew automatically and salting remains for the extreme tail."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    conf = spark.conf
    old = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        # shrink thresholds so test-sized data counts as skewed, and
        # forbid broadcast so the join stays a shuffle join
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        # 200k rows on ONE key + a sprinkle of others: one hot partition
        big = spark.range(200_000).select(
            F.when(F.col("id") % 20 == 0, F.col("id") % 7).otherwise(F.lit(0)).alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(7).select(
            F.col("id").alias("k2"), F.lit("dim").alias("name")
        )
        # keep payload + a fat string column in the output: column pruning
        # would otherwise shrink the hot partition below the skew threshold
        big = big.withColumn("fat", F.concat_ws("-", *[F.col("payload")] * 8))
        joined = big.join(small, big.k == small.k2).select("k", "name", "payload", "fat")
        # action on THIS DataFrame's query execution: count()/noop would
        # spawn a separate execution whose adaptive plan we can't read
        n = len(joined.collect())
        assert n == 200_000

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)

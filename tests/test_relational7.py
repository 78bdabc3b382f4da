"""Structural invariants for the warehouse-maintenance shapes
(oracle value-parity is covered by tests/test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.queries import QUERIES, load_all_queries

load_all_queries()

SF_DIR = "/root/testdata/sf0.001"


def test_scd2_intervals_chain(spark):
    df = QUERIES["order_history_scd2"](spark, SF_DIR).cache()
    try:
        # exactly one open (is_current) interval per customer
        per_cust = (
            df.groupBy("o_custkey")
            .agg(
                F.sum("is_current").alias("n_open"),
                F.max("seq").alias("max_seq"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        assert per_cust, "keeper filter produced no customers"
        for r in per_cust:
            assert r["n_open"] == 1
            assert r["max_seq"] == r["n"]  # seq is dense 1..n

        # closed intervals: valid_to equals the NEXT row's valid_from
        nxt = df.select(
            "o_custkey",
            (F.col("seq") - 1).alias("seq"),
            F.col("valid_from").alias("next_from"),
        )
        broken = (
            df.where(F.col("is_current") == 0)
            .join(nxt, ["o_custkey", "seq"])
            .where(F.col("valid_to") != F.col("next_from"))
            .count()
        )
        assert broken == 0
        # the open interval carries the sentinel
        assert (
            df.where(F.col("is_current") == 1)
            .where(F.col("valid_to") != "9999-12-31")
            .count()
            == 0
        )
    finally:
        df.unpersist()


def test_rfm_segments_partition_invariance_and_bounds(spark):
    df = QUERIES["rfm_segments"](spark, SF_DIR)
    rows = {
        (r["c_mktsegment"], r["rfm_segment"]): (r["n_customers"], r["total_cents"])
        for r in df.collect()
    }
    assert rows
    for (seg, rfm), _ in rows.items():
        r, f_, m = rfm.split("-")
        assert {int(r), int(f_), int(m)} <= {1, 2, 3, 4}

    # deterministic under a different input partitioning: NTILE's total
    # order (metric, o_custkey) is partition-independent by design
    from tfm_semisup_spark.queries.relational7 import rfm_segments

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        again = {
            (r["c_mktsegment"], r["rfm_segment"]): (
                r["n_customers"],
                r["total_cents"],
            )
            for r in rfm_segments(spark, SF_DIR).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    assert again == rows


def test_rfm_segments_survives_no_broadcast(spark):
    """Broadcast-policy rehearsal (VERDICT r4 #3): with auto-broadcast
    disabled — the planner's stand-in for "customer no longer fits" —
    the shape must still complete via a shuffle join with identical
    results, i.e. nothing in the plan FORCES a broadcast of an
    SF-linear table."""
    from tfm_semisup_spark.queries.relational7 import rfm_segments

    baseline = {
        (r["c_mktsegment"], r["rfm_segment"]): (r["n_customers"], r["total_cents"])
        for r in rfm_segments(spark, SF_DIR).collect()
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = rfm_segments(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastHashJoin" not in plan, (
            "a join still forces broadcast with the threshold disabled:\n"
            + plan
        )
        nohint = {
            (r["c_mktsegment"], r["rfm_segment"]): (
                r["n_customers"],
                r["total_cents"],
            )
            for r in df.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert nohint == baseline

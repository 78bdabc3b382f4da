"""Bloom semi-join reduction (operators/bloom_join.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfm_semisup_spark.operators.bloom_join import (
    BLOOM_JOIN_WORDS,
    bloom_probe_predicate,
    bloom_semijoin,
    build_key_bloom,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_suppkey", "l_quantity"
    )
    supp = spark.read.parquet(f"{SF}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    return li, supp


def test_no_false_negatives(spark, tables):
    """Every dim key must pass its own bloom filter — the exactness
    guarantee is BY CONSTRUCTION, so test it on the dim itself."""
    _, supp = tables
    dim = supp.where(F.col("s_nationkey") == 3)
    bloom = build_key_bloom(dim, "s_suppkey")
    pred = bloom_probe_predicate("s_suppkey", bloom)
    n_dim = dim.count()
    n_pass = dim.where(F.expr(pred)).count()
    assert n_pass == n_dim


def test_pruned_join_equals_plain_join(spark, tables):
    li, supp = tables
    dim = supp.where(F.col("s_nationkey") == 3)
    pruned = bloom_semijoin(li, dim, "l_suppkey", "s_suppkey")
    plain = li.join(dim, li.l_suppkey == dim.s_suppkey)
    a = sorted(map(tuple, pruned.select("l_suppkey", "l_quantity").collect()))
    b = sorted(map(tuple, plain.select("l_suppkey", "l_quantity").collect()))
    assert a == b and len(a) > 0


def test_filter_actually_prunes(spark, tables):
    """With a selective dim the probe must reject most fact rows (the
    whole point is shuffle reduction, not just correctness)."""
    li, supp = tables
    dim = supp.where(F.col("s_nationkey") == 3)
    bloom = build_key_bloom(dim, "s_suppkey")
    survivors = li.where(
        F.expr(bloom_probe_predicate("l_suppkey", bloom))
    ).count()
    total = li.count()
    exact = li.join(dim, li.l_suppkey == dim.s_suppkey).count()
    assert exact <= survivors < total * 0.5


def test_probe_is_scan_side_filter(spark, tables):
    """The bitset probe must be a Filter in the fact's pre-shuffle
    stage (element_at over the literal array), not a join."""
    li, supp = tables
    dim = supp.where(F.col("s_nationkey") == 3)
    joined = bloom_semijoin(li, dim, "l_suppkey", "s_suppkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "element_at" in plan


def test_bitset_size_bounded(spark, tables):
    _, supp = tables
    bloom = build_key_bloom(supp, "s_suppkey")
    assert len(bloom) == BLOOM_JOIN_WORDS

"""functions/vector.py: fixed-arity vs HOF equality (incl. the round-4
high-dim codegen guard) and the zero-job io.embedding_dim probe."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from tfm_semisup_spark.functions.vector import (
    CODEGEN_DIM_LIMIT,
    _dot_flat,
    cosine_similarity,
    cosine_similarity_fixed,
    dot,
    dot_fixed,
)
from tfm_semisup_spark.io import embedding_dim

SF = "/root/testdata/sf0.001"


def _pairs(spark, dim: int, n: int = 6):
    rng = random.Random(dim)
    rows = [
        (
            i,
            [rng.uniform(-1, 1) for _ in range(dim)],
            [rng.uniform(-1, 1) for _ in range(dim)],
        )
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "i long, a array<double>, b array<double>"
    )


def test_flat_and_hof_forms_bit_equal_below_limit(spark):
    """Both forms fold left-to-right by index — results must be
    bit-identical, which is what lets the guard switch forms without
    touching oracle parity."""
    rows, df = _pairs(spark, dim=64)
    out = df.select(
        "i",
        _dot_flat(F.col("a"), F.col("b"), 64).alias("flat"),
        dot(F.col("a"), F.col("b")).alias("hof"),
        cosine_similarity_fixed(F.col("a"), F.col("b"), 64).alias("cf"),
        cosine_similarity(F.col("a"), F.col("b")).alias("ch"),
    ).collect()
    for r in out:
        assert r["flat"] == r["hof"]  # bit-equal, not approx
        assert r["cf"] == r["ch"]


def test_high_dim_guard_falls_back_to_hof(spark):
    """Past CODEGEN_DIM_LIMIT the public helpers must produce the HOF
    expression (flat 3x-dim trees exceed whole-stage-codegen limits and
    silently interpret — VERDICT r3 #4), and values must match numpy."""
    dim = 1024
    assert dim > CODEGEN_DIM_LIMIT
    hi = dot_fixed(F.col("a"), F.col("b"), dim)
    assert "aggregate" in str(hi) and "element_at" not in str(hi)
    lo = dot_fixed(F.col("a"), F.col("b"), 8)
    assert "element_at" in str(lo)

    rows, df = _pairs(spark, dim=dim, n=3)
    out = df.select(
        "i", cosine_similarity_fixed(F.col("a"), F.col("b"), dim).alias("c")
    ).collect()
    for r in out:
        a, b = rows[r["i"]][1], rows[r["i"]][2]
        exact = sum(x * y for x, y in zip(a, b)) / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )
        assert r["c"] == pytest.approx(exact, abs=1e-12)


def test_embedding_dim_zero_jobs_and_memoized(spark):
    # no SparkSession parameter at all — the probe is pure pyarrow
    assert embedding_dim(SF) == 64
    from tfm_semisup_spark.io import _ARRAY_DIM_CACHE

    key = (f"{SF}/embeddings.parquet", "embedding")
    assert _ARRAY_DIM_CACHE[key] == 64
    # poison the cache: a second call must not re-read the file
    _ARRAY_DIM_CACHE[key] = 99
    assert embedding_dim(SF) == 99
    del _ARRAY_DIM_CACHE[key]
    # agreement with what Spark computes
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert emb.select(F.size("embedding")).head()[0] == 64

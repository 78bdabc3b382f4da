"""Vector/array columnar helpers.

The reference computes the max posterior probability with a Scala UDF
``udf((v: Vector) => v.toArray.max)`` (``SelfTraining.scala:128``,
``CoTraining.scala:128``). A Python UDF here would add a per-row
JVM<->Python pickle boundary inside the self-training loop; instead we
stay in Tungsten codegen with ``vector_to_array`` + ``array_max``.

Embedding similarity uses ``zip_with``/``aggregate`` over
``array<float>`` columns — also fully JVM-side. At 100 TB these
expressions vectorize inside whole-stage codegen; the Python process
only builds the plan.
"""

from __future__ import annotations

from pyspark.ml.functions import vector_to_array
from pyspark.sql import Column
from pyspark.sql import functions as F


def prob_max(probability_col: str | Column = "probability") -> Column:
    """Max class posterior from an ml Vector column (no UDF).

    Re-expression of the reference's ``v.toArray.max`` UDF
    (SelfTraining.scala:128).
    """
    col = F.col(probability_col) if isinstance(probability_col, str) else probability_col
    return F.array_max(vector_to_array(col))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (brute-force path
    of the similarity-search operator; the scale path is LSH bucketing in
    ``operators/similarity.py``)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))

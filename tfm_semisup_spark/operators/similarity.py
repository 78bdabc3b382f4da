"""Approximate nearest-neighbor search over embeddings (SURVEY.md §2.3).

Two paths:

- brute-force cosine top-k (``queries/similarity.py``): exact, zero
  shuffle, O(N) scan — the oracle baseline and the right answer when
  the query batch is small.
- LSH-bucketed ANN (here): BucketedRandomProjectionLSH
  ``approxNearestNeighbors`` — sub-linear candidate set via
  random-hyperplane buckets; the 100 TB path when query volume is high
  (bucketing amortizes across queries).

An IVF-style variant (k-means coarse quantizer + per-centroid inverted
lists) is the classic next step; LSH covers the same access pattern
with model-free determinism (seeded), so it ships first.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_ann_index(
    embeddings: DataFrame,
    vector_col: str = "features",
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    seed: int = 42,
):
    """Fit the LSH 'index' (a set of random hyperplanes — tiny model,
    broadcastable; the bucketed dataset is what lives at scale)."""
    lsh = BucketedRandomProjectionLSH(
        inputCol=vector_col,
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    return lsh.fit(embeddings)


def with_feature_vectors(embeddings: DataFrame, array_col: str = "embedding") -> DataFrame:
    return embeddings.withColumn(
        "features", array_to_vector(F.col(array_col).cast("array<double>"))
    )


def ann_top_k(
    model,
    embeddings: DataFrame,
    query_vector,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """k approximate nearest neighbors (euclidean) of one query vector."""
    neighbors = model.approxNearestNeighbors(embeddings, query_vector, k)
    return neighbors.select(
        F.col(id_col), F.round("distCol", 4).alias("euclidean")
    )

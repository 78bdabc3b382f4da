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


def build_ivf_index(
    embeddings: DataFrame,
    vector_col: str = "features",
    num_centroids: int = 16,
    seed: int = 42,
):
    """IVF coarse quantizer: k-means centroids + bucketed dataset.

    The classic ANN scale path next to LSH: fit k centroids (tiny model,
    broadcast), assign every vector to its nearest centroid ONCE at
    index-build time; queries probe only the closest n_probe buckets.
    Returns (kmeans_model, bucketed DataFrame with `ivf_bucket`).
    """
    from pyspark.ml.clustering import KMeans

    km = KMeans(k=num_centroids, seed=seed, featuresCol=vector_col,
                predictionCol="ivf_bucket")
    model = km.fit(embeddings)
    return model, model.transform(embeddings)


def ivf_top_k(
    kmeans_model,
    bucketed: DataFrame,
    query_vector,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vector_col: str = "features",
) -> DataFrame:
    """k nearest neighbors (euclidean) probing the n_probe closest
    centroids' buckets only — candidate set is ~n_probe/num_centroids
    of the corpus; partition pruning does the rest if the index is
    written partitioned by bucket."""
    import numpy as np
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    centers = kmeans_model.clusterCenters()
    q = np.asarray(query_vector.toArray() if hasattr(query_vector, "toArray") else query_vector)
    order = np.argsort([float(np.linalg.norm(q - c)) for c in centers])
    probe = [int(b) for b in order[:n_probe]]

    arr = vector_to_array(F.col(vector_col))
    q_lit = F.array(*[F.lit(float(v)) for v in q])
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(arr, q_lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    # order by the EXACT distance; rounding first could flip the k-th
    # boundary between near-tied candidates
    return (
        bucketed.where(F.col("ivf_bucket").isin(probe))
        .select(id_col, dist.alias("__d"))
        .orderBy("__d", id_col)
        .limit(k)
        .select(id_col, F.round("__d", 4).alias("euclidean"))
    )


def ann_top_k_batch(
    model,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    max_distance: float = 5.0,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k per query for a whole QUERY SET in one pass:
    ``approxSimilarityJoin`` compares only same-LSH-bucket pairs (the
    bucketing amortizes across queries — this is where LSH beats N
    single-query scans), then a per-query PARTITIONED rank window takes
    k. Deterministic: seeded hyperplanes + (dist, id) tie-break."""
    from pyspark.sql.window import Window

    joined = model.approxSimilarityJoin(queries, corpus, max_distance, distCol="dist")
    w = Window.partitionBy(query_id_col).orderBy("dist", id_col)
    return (
        joined.select(
            F.col(f"datasetA.{query_id_col}").alias(query_id_col),
            F.col(f"datasetB.{id_col}").alias(id_col),
            F.col("dist"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            query_id_col, id_col, F.round("dist", 4).alias("euclidean")
        )
    )


def ivf_top_k_batch(
    kmeans_model,
    bucketed: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vector_col: str = "features",
) -> DataFrame:
    """Batch IVF retrieval, fully columnar (no per-query driver work):

    1. centroids (tiny) broadcast-cross-joined to the query set; a
       per-query PARTITIONED rank keeps the n_probe nearest buckets;
    2. the corpus joins the probe list on ``ivf_bucket`` — a broadcast
       hash join when the query set is small, so each corpus row is
       compared only against queries probing ITS bucket
       (~n_probe/num_centroids of the query set);
    3. exact distance + per-query partitioned rank takes k.

    Deterministic: k-means is seeded, ties broken on (dist, id).
    """
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql.window import Window

    spark = bucketed.sparkSession
    centers_df = spark.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(kmeans_model.clusterCenters())
        ],
        "ivf_bucket int, center array<double>",
    )

    def sq_dist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    qarr = vector_to_array(F.col(vector_col)).cast("array<double>")
    w_probe = Window.partitionBy(query_id_col).orderBy("__cd", "ivf_bucket")
    probes = (
        queries.select(query_id_col, qarr.alias("__qv"))
        .crossJoin(F.broadcast(centers_df))
        .withColumn("__cd", sq_dist(F.col("__qv"), F.col("center")))
        .withColumn("__rn", F.row_number().over(w_probe))
        .where(F.col("__rn") <= n_probe)
        .select(query_id_col, "__qv", "ivf_bucket")
    )

    carr = vector_to_array(F.col(vector_col)).cast("array<double>")
    w_k = Window.partitionBy(query_id_col).orderBy("__d", id_col)
    return (
        bucketed.select(id_col, "ivf_bucket", carr.alias("__cv"))
        .join(F.broadcast(probes), "ivf_bucket")
        .withColumn("__d", F.sqrt(sq_dist(F.col("__cv"), F.col("__qv"))))
        .withColumn("__rn", F.row_number().over(w_k))
        .where(F.col("__rn") <= k)
        .select(query_id_col, id_col, F.round("__d", 4).alias("euclidean"))
    )

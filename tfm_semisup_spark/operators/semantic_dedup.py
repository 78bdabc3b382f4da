"""Semantic deduplication over embeddings (SemDeDup shape: Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" — cluster the embedding space, then drop
near-identical members WITHIN each cluster).

This is the third dedup family next to lexical near-dup (MinHash/
SimHash/Jaccard) and exact hashing: it catches paraphrases and
re-encodings that share no surface n-grams but embed to almost the
same point.

Spark-first shape (every stage bounded / bucketed):

1. **centroids** train DRIVER-SIDE with seeded Lloyd's on a
   hash-selected bounded sample (identical pattern to PQ codebook
   training, ``build_pq_index``): at 100 TB the driver sees at most
   ``max_train_rows`` vectors.
2. **assignment** is ONE columnar projection — squared distance to
   each broadcast-literal centroid via ``F.transform`` + argmin; no
   shuffle, no Python.
3. **within-cluster pairs**: self-join ON the cluster id (shuffle
   keyed by cluster — candidate count is Σ|cluster|², never N²;
   ``num_clusters`` should scale ~N/expected_cluster_size, and a
   pathological mega-cluster is the same skew problem the LSH tiers
   handle with salting). Cosine is computed on pre-normalized
   vectors, so the pair predicate is one dot product.
4. **canonicalization**: pairs above threshold feed the existing
   ``connected_components`` operator; the keeper of each semantic
   cluster is the min id (content-defined, deterministic) — SemDeDup
   keeps one representative per duplicate group; which one is a free
   policy choice, and min-id is the partitioning-independent one.

Deterministic end-to-end: seeded centroid sample + seeded Lloyd's,
columnar assignment, min-id keepers — no partitioning sensitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfm_semisup_spark.operators.components import connected_components


def train_semantic_centroids(
    embeddings: DataFrame,
    array_col: str = "embedding",
    id_col: str = "vec_id",
    num_clusters: int = 16,
    seed: int = 42,
    max_train_rows: int = 100_000,
):
    """Driver-side seeded Lloyd's on a hash-mod bounded sample (the
    faiss-style training shape shared with build_pq_index); returns a
    numpy (num_clusters, dim) array."""
    import numpy as np

    from tfm_semisup_spark.operators.similarity import _lloyd

    approx_n = embeddings.agg(F.approx_count_distinct(id_col).alias("n")).head()["n"]
    train_mod = max(1, -(-int(approx_n) // max_train_rows))
    train = embeddings
    if train_mod > 1:
        train = train.where(F.abs(F.xxhash64(F.col(id_col))) % train_mod == 0)
    rows = sorted(
        train.select(
            F.abs(F.xxhash64(F.col(id_col))).alias("__h"),
            F.col(id_col).alias("__id"),
            F.col(array_col).cast("array<double>").alias("__v"),
        ).collect(),
        key=lambda r: (r["__h"], r["__id"]),
    )
    sample = np.asarray([r["__v"] for r in rows[:max_train_rows]])
    return _lloyd(sample, num_clusters, seed)


def assign_clusters(
    embeddings: DataFrame,
    centroids,
    array_col: str = "embedding",
    out_col: str = "sem_cluster",
) -> DataFrame:
    """Nearest-centroid assignment as one codegen projection: the
    centroid matrix rides along as array literals (tiny broadcast),
    distance per centroid via transform/zip_with, argmin via
    array_position(array_min). No shuffle."""
    arr = F.col(array_col).cast("array<double>")
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in centroids]
    )
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(arr, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return embeddings.withColumn(
        out_col, (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )


def semantic_dup_pairs(
    assigned: DataFrame,
    threshold: float = 0.95,
    array_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "sem_cluster",
) -> DataFrame:
    """(doc_a, doc_b, cos_sim) for same-cluster pairs with cosine ≥
    threshold, a < b. Vectors are L2-normalized in the projection, so
    the join predicate is one dot product on the pair.

    The normalized projection is materialized (localCheckpoint) before
    the self-join: both join sides and every downstream consumer then
    scan (id, cluster, unit-vector) rows instead of re-evaluating —
    and re-CODEGENING — the wide centroid-literal assignment
    expression per side (measured at sf0.1: pairs 12.3s -> ~1s)."""
    from tfm_semisup_spark.operators.lineage import truncate

    arr = F.col(array_col).cast("array<double>")
    norm = F.sqrt(
        F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    unit = truncate(
        assigned.withColumn("__n", norm).select(
            F.col(id_col).alias("id"),
            F.col(cluster_col).alias("c"),
            F.transform(arr, lambda v: v / F.col("__n")).alias("u"),
        )
    )
    a = unit.select(
        F.col("id").alias("doc_a"), F.col("c"), F.col("u").alias("ua")
    )
    b = unit.select(
        F.col("id").alias("doc_b"), F.col("c").alias("cb"), F.col("u").alias("ub")
    )
    # flat element_at sum, NOT zip_with/aggregate: Spark higher-order
    # functions are interpreted (excluded from whole-stage codegen),
    # and the dot product runs once per CANDIDATE pair — the hot
    # expression of the whole operator. A fixed-arity sum of
    # element_at products stays inside codegen.
    dim = assigned.select(F.size(F.col(array_col)).alias("d")).head()["d"]
    cos = sum(
        (F.element_at("ua", k) * F.element_at("ub", k) for k in range(2, dim + 1)),
        F.element_at("ua", 1) * F.element_at("ub", 1),
    )
    return (
        a.join(b, (a["c"] == b["cb"]) & (a["doc_a"] < b["doc_b"]))
        .withColumn("cos_sim", cos)
        .where(F.col("cos_sim") >= threshold)
        .select("doc_a", "doc_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def semantic_dedup(
    embeddings: DataFrame,
    array_col: str = "embedding",
    id_col: str = "vec_id",
    num_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    max_train_rows: int = 100_000,
) -> DataFrame:
    """Full SemDeDup pass: returns (id, sem_cluster, component, keep)
    for every input row — ``keep`` is false exactly for non-canonical
    members of a semantic duplicate group (canonical = min id via
    connected components over the above-threshold pair graph)."""
    from tfm_semisup_spark.operators.lineage import truncate

    centroids = train_semantic_centroids(
        embeddings, array_col, id_col, num_clusters, seed, max_train_rows
    )
    # materialize the assignment once: the centroid-literal projection
    # is wide (num_clusters x dim literals in codegen) and is consumed
    # by both the pair tier and the final join
    assigned = truncate(assign_clusters(embeddings, centroids, array_col))
    pairs = semantic_dup_pairs(assigned, threshold, array_col, id_col)
    comp = connected_components(pairs)  # only nodes WITH a near-dup edge
    return (
        assigned.select(F.col(id_col).alias("id"), "sem_cluster")
        .join(comp, F.col("id") == comp["node"], "left")
        .select(
            "id",
            "sem_cluster",
            F.coalesce("component", F.col("id")).alias("component"),
            (F.coalesce("component", F.col("id")) == F.col("id")).alias("keep"),
        )
    )

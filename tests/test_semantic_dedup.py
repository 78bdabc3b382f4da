"""SemDeDup semantic dedup (operators/semantic_dedup.py): planted
near-identical embeddings are dropped, distinct ones kept, keepers are
min-id canonical, and the whole pass is deterministic under
repartitioning."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.semantic_dedup import (
    assign_clusters,
    semantic_dedup,
    semantic_dup_pairs,
    train_semantic_centroids,
)

SF = "/root/testdata/sf0.001"
DIM = 8


def _planted(spark, n_base=40, dup_groups=3):
    """n_base well-separated random vectors + dup_groups groups of 3
    near-identical copies (tiny deterministic jitter)."""
    rng = random.Random(7)
    rows = []
    vid = 0
    for _ in range(n_base):
        rows.append((vid, [rng.uniform(-1, 1) for _ in range(DIM)]))
        vid += 1
    dup_ids = []
    for g in range(dup_groups):
        base = [rng.uniform(-1, 1) for _ in range(DIM)]
        group = []
        for j in range(3):
            jitter = [v + 1e-4 * (g + j + 1) for v in base]
            rows.append((vid, jitter))
            group.append(vid)
            vid += 1
        dup_ids.append(group)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, dup_ids


def test_planted_duplicates_dropped_min_id_kept(spark):
    df, dup_groups = _planted(spark)
    out = {r["id"]: r for r in semantic_dedup(df, num_clusters=4, threshold=0.999).collect()}
    assert len(out) == df.count()
    for group in dup_groups:
        keeper = min(group)
        for vid in group:
            assert out[vid]["component"] == keeper
            assert out[vid]["keep"] == (vid == keeper)
    # non-planted vectors survive (random 8-dim vectors don't reach
    # cosine 0.999 against each other)
    kept = [vid for vid, r in out.items() if r["keep"]]
    assert len(kept) == df.count() - 2 * len(dup_groups)


def test_assignment_is_nearest_centroid_and_shuffle_free(spark):
    df, _ = _planted(spark)
    cents = train_semantic_centroids(df, num_clusters=4, max_train_rows=1000)
    assigned = assign_clusters(df, cents)
    # spot-check argmin against numpy on a few rows
    import numpy as np

    for r in assigned.orderBy("vec_id").limit(10).collect():
        d = ((np.asarray(r["embedding"]) - cents) ** 2).sum(axis=1)
        assert r["sem_cluster"] == int(d.argmin())
    # assignment adds no Exchange: single-stage scan+project
    plan = assigned._sc._jvm.PythonSQLUtils.explainString(
        assigned._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan


def test_pair_cosine_matches_exact(spark):
    df, dup_groups = _planted(spark)
    cents = train_semantic_centroids(df, num_clusters=1, max_train_rows=1000)
    pairs = semantic_dup_pairs(
        assign_clusters(df, cents), threshold=0.999
    ).collect()
    rows = {r["vec_id"]: r["embedding"] for r in df.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    expected = set()
    for ia in rows:
        for ib in rows:
            if ia < ib and cos(rows[ia], rows[ib]) >= 0.999:
                expected.add((ia, ib))
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == expected
    for r in pairs:
        assert abs(r["cos_sim"] - cos(rows[r["doc_a"]], rows[r["doc_b"]])) < 1e-5


def test_registered_query_deterministic_under_partitioning(spark):
    emb = load_table(spark, SF, "embeddings")
    base = semantic_dedup(emb, threshold=0.45).orderBy("id").collect()
    repart = semantic_dedup(emb.repartition(7), threshold=0.45).orderBy("id").collect()
    assert base == repart
    assert len(base) == emb.count()

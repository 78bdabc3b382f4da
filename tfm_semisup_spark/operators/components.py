"""Connected components over near-duplicate pair graphs.

The dedup tier produces PAIR lists (MinHash LSH / SimHash / capped
n-gram Jaccard); a real corpus dedup needs CLUSTERS — each document
assigned the min doc_id reachable through near-dup edges, so one
canonical keeper survives per cluster (transitive closure, same
semantics as the union-find pass most pipeline stacks run after LSH).

Algorithm: iterative min-label propagation with a pointer-jumping step
(label-of-label) each round, so convergence is O(log diameter) rounds
instead of O(diameter) — the property that matters on adversarial
chain-shaped clusters at 100 TB. Each round is two shuffles of
(node, label) pairs only (never document payloads):

  1. neighbor-min: edges ⋈ labels, groupBy node, min(label);
  2. pointer jump:  labels ⋈ labels on (label = node).

Lineage is truncated each round (localCheckpoint; pass
``checkpoint_dir`` for durable truncation on a preemptible cluster —
same discipline as SelfTraining, operators/self_training.py).
Termination is exact: iterate until a round changes zero labels
(convergence detected via a count aggregate, a scalar per round).

Deterministic: the component label is min(doc_id) over the cluster —
content-defined, independent of partitioning and execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfm_semisup_spark.operators.lineage import release, truncate


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node incident to an edge in
    ``pairs``; component = min node id reachable.

    ``pairs`` is an undirected edge list (one row per pair, either
    orientation). max_iter bounds the driver loop; with pointer
    jumping, 25 rounds covers clusters of diameter ~2^25 — effectively
    any graph. Raises if not converged (never silently wrong).
    """
    edges = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(pairs.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
    )
    edges = truncate(edges, checkpoint_dir)

    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    labels = truncate(labels, checkpoint_dir)

    ckpt = labels  # handle to the blocks backing the current labels
    for _ in range(max_iter):
        # 1. min label over the open neighborhood
        nbr_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        # 2. pointer jump: label <- label(label) (path halving)
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = (
            stepped.join(parent, stepped["label"] == parent["p_node"], "left")
            .select(
                "node",
                "old_label",
                F.least(
                    F.col("label"), F.coalesce("p_label", F.col("label"))
                ).alias("label"),
            )
        )
        # old_label rides along in the checkpoint, so convergence
        # detection is a SCAN of the fresh blocks — no join against the
        # previous round (one fewer shuffle per round).
        jumped = truncate(jumped, checkpoint_dir)

        changed = jumped.where(F.col("old_label") != F.col("label")).count()
        release(ckpt)  # superseded round's blocks, freed eagerly
        ckpt = jumped
        labels = jumped.select("node", "label")
        if changed == 0:
            release(edges)
            return labels.select("node", F.col("label").alias("component"))

    release(edges)
    release(ckpt)
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def cluster_keepers(components: DataFrame) -> DataFrame:
    """(component, n_members) per near-dup cluster; the component label
    IS the keeper doc_id (min of the cluster), so deletion lists are
    `members where node != component`."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members")
    )

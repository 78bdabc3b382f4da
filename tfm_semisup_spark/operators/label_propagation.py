"""Graph-based semi-supervised learning: clamped label propagation.

Completes the classic SSL family alongside the reference's
self-training (``SelfTraining.scala:121-207``) and co-training
(``CoTraining.scala:122-253``): where those wrap base classifiers,
label propagation (Zhu & Ghahramani 2002; the hard-label variant is
the semi-supervised form of Raghavan et al.'s LPA) needs only a
similarity graph. Each synchronous round, every node adopts the
majority label among its currently-labeled neighbors; SEED nodes are
clamped to their known label. All arithmetic is integer votes with a
deterministic tie-break (highest count, then smallest label), so the
fixed-iteration result is exactly reproducible on any engine — the
registered query (``queries/ssl_queries.py`` ssl_label_propagation)
is DuckDB-oracled, the first oracle-checked member of the SSL family.

Spark-first shape (same iterative discipline as
``operators/pagerank.py`` / ``components.py``):

- the (symmetrized) edge list is persisted ONCE and reused by every
  round; at 100 TB the edge list comes from the LSH-bucketed
  similarity tiers (``operators/similarity.py`` /
  ``operators/dedup.py`` embedding_near_dup_pairs), never an
  all-pairs scan — the oracle tier's exact-cosine graph is bounded by
  a keyed subset, mirroring similarity_pairs_above;
- each round is one shuffle keyed by dst (vote aggregation), one
  partition-local window (argmax with tie-break), and one join back
  onto the label table keyed by node — 2 key shuffles per round;
- every round's label table is localCheckpoint-truncated and the
  superseded round's blocks are released eagerly (O(1) lineage,
  O(|nodes|) storage, any iteration count);
- a ≤2M-edge graph takes the driver path — which collects only the
  EDGE-INCIDENT nodes (≤ 2*n_edges rows; the node table itself can be
  corpus-sized while the graph is sparse) and streams isolated nodes
  through unchanged (no votes in, no votes out, y invariant) —
  identical results by construction (integer votes, same tie-break),
  equality-tested against the distributed rounds in
  tests/test_label_propagation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.operators.lineage import release, truncate

#: same bound (and same reasoning) as components/pagerank: a
#: similarity graph distilled from a corpus is orders of magnitude
#: smaller than the corpus; 2M long-pairs collect as ~32 MB.
SMALL_GRAPH_MAX_EDGES = 2_000_000

_LABEL_SCHEMA = "node long, is_seed int, y_true long, y long"


def _driver_propagate(label_rows, edge_rows, iters: int):
    """Synchronous clamped majority-vote rounds over collected rows.
    Votes are integer counts; ties break (count desc, label asc) —
    identical to the distributed window's ordering."""
    labels = {r[0]: (r[1], r[2], r[3]) for r in label_rows}
    adj: dict[int, list[int]] = {}
    for src, dst in edge_rows:
        adj.setdefault(dst, []).append(src)
    for _ in range(iters):
        cur = {n: y for n, (_, _, y) in labels.items() if y is not None}
        nxt = {}
        for node, (is_seed, y_true, y) in labels.items():
            if is_seed:
                nxt[node] = (is_seed, y_true, y_true)
                continue
            votes: dict[int, int] = {}
            for nb in adj.get(node, ()):
                lab = cur.get(nb)
                if lab is not None:
                    votes[lab] = votes.get(lab, 0) + 1
            if votes:
                best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                nxt[node] = (is_seed, y_true, best)
            else:
                nxt[node] = (is_seed, y_true, y)
        labels = nxt
    return [(n, s, t, y) for n, (s, t, y) in labels.items()]


def propagate_labels(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    node_col: str = "node",
    seed_col: str = "is_seed",
    label_col: str = "y_true",
    src_col: str = "src",
    dst_col: str = "dst",
    symmetrize: bool = True,
    small_graph_max_edges: int | None = None,
) -> DataFrame:
    """Run ``iters`` clamped majority-vote rounds; returns
    (node, is_seed, y_true, y) where ``y`` is NULL for nodes never
    reached by a labeled neighbor. ``nodes``: one row per node with a
    0/1 seed flag and the (nullable for non-seeds) true label.
    ``edges``: directed pairs; ``symmetrize=True`` adds the reverse
    direction so an undirected pair list propagates both ways."""
    if small_graph_max_edges is None:
        small_graph_max_edges = SMALL_GRAPH_MAX_EDGES
    spark = nodes.sparkSession
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    if symmetrize:
        e = e.unionAll(
            edges.select(
                F.col(dst_col).cast("long").alias("src"),
                F.col(src_col).cast("long").alias("dst"),
            )
        )
    base = nodes.select(
        F.col(node_col).cast("long").alias("node"),
        F.col(seed_col).cast("int").alias("is_seed"),
        F.col(label_col).cast("long").alias("y_true"),
        F.when(F.col(seed_col).cast("int") == 1, F.col(label_col))
        .cast("long")
        .alias("y"),
    )

    # materialize the edge list ONCE — the size probe and whichever
    # execution path follows both read the checkpointed blocks instead
    # of re-running the (possibly expensive) edge derivation
    e = truncate(e)
    n_edges = e.count()
    if n_edges <= small_graph_max_edges:
        # Collect ONLY edge-incident nodes (≤ 2*n_edges ≤ 4M longs):
        # the node table can be corpus-sized even when the similarity
        # graph is sparse — isolated nodes receive no votes and vote
        # for nobody, so their y is invariant across rounds (seeds are
        # clamped to y_true from initialization) and they stream
        # through the distributed plan unchanged (VERDICT r7 #3).
        # checkpointed so its lineage no longer references e's blocks —
        # the returned (lazy) isolated-node leg outlives release(e)
        endpoints = truncate(
            e.select(F.col("src").alias("node"))
            .unionAll(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        incident = base.join(F.broadcast(endpoints), "node", "left_semi")
        rows = _driver_propagate(
            [tuple(r) for r in incident.collect()],
            [tuple(r) for r in e.collect()],
            iters,
        )
        release(e)
        isolated = base.join(F.broadcast(endpoints), "node", "left_anti").select(
            "node", "is_seed", "y_true", "y"
        )
        return spark.createDataFrame(rows, _LABEL_SCHEMA).unionAll(isolated)

    labels = truncate(base)
    for _ in range(iters):
        votes = (
            labels.where(F.col("y").isNotNull())
            .select("node", "y")
            .join(e, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("vnode"), F.col("y").alias("vy"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("vnode").orderBy(F.desc("c"), F.asc("vy"))
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vnode", F.col("vy").alias("vote"))
        )
        nxt = (
            labels.join(best, labels.node == best.vnode, "left")
            .select(
                "node",
                "is_seed",
                "y_true",
                F.when(F.col("is_seed") == 1, F.col("y_true"))
                .otherwise(F.coalesce(F.col("vote"), F.col("y")))
                .alias("y"),
            )
        )
        prev = labels
        labels = truncate(nxt)
        release(prev)
    release(e)
    return labels

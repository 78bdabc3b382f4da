"""Fixed-iteration PageRank on a DataFrame edge list.

Corpus-curation use: rank domains/items in a link or co-engagement
graph to weight sampling (the CommonCrawl-style "harmonic/centrality
rank" signal used to prioritize crawl data). Power iteration:

    r_{t+1}(v) = (1 - d) / N + d * sum_{u->v} r_t(u) / deg(u)

Spark-first shape (same iterative discipline as
``operators/components.py``):

- the edge list is JOINED ONCE with out-degrees and checkpointed; each
  iteration is then one join (ranks ⋈ edges on src) + one aggregation
  (sum contributions keyed by dst) — two shuffles per round on long
  keys, nothing wider;
- every round's rank table is ``truncate``-checkpointed and the
  previous round's blocks are released eagerly, so lineage stays O(1)
  and memory O(|nodes|) regardless of iteration count;
- fixed iteration count (deterministic, oracle-matchable) rather than
  convergence-epsilon — the caller picks iters; rank error decays as
  d^t.

Assumes every node has at least one outgoing AND one incoming edge —
true by construction for symmetric (undirected) edge lists, which is
what the registered query feeds it. Dangling-node redistribution is
deliberately out of scope (symmetric graphs have none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfm_semisup_spark.operators.lineage import release, truncate

#: same bound (and same reasoning) as components.SMALL_GRAPH_MAX_EDGES:
#: distributed rounds cost jobs + shuffles that dwarf the data when the
#: graph is small, and a co-engagement/link graph distilled from a
#: corpus is orders of magnitude smaller than the corpus. 2M edges
#: collect as ~32 MB of longs; the driver loop is numpy over dense
#: index arrays. Ranks agree with the distributed rounds to float
#: accumulation order (~1e-15 relative — both paths' consumers round
#: far coarser), equality-tested in tests/test_graph_boilerplate.py.
SMALL_GRAPH_MAX_EDGES = 2_000_000


def _driver_pagerank(edge_rows, damping: float, iters: int):
    """Power iteration over collected (src, dst) rows with numpy."""
    import numpy as np

    nodes = sorted({r[0] for r in edge_rows} | {r[1] for r in edge_rows})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    src = np.fromiter((idx[r[0]] for r in edge_rows), dtype=np.int64)
    dst = np.fromiter((idx[r[1]] for r in edge_rows), dtype=np.int64)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / deg[src])
        r = (1.0 - damping) / n + damping * contrib
    return [(int(node), float(r[idx[node]])) for node in nodes]


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    small_graph_max_edges: int = SMALL_GRAPH_MAX_EDGES,
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations over the directed
    edge list. ``sum(rank) == 1`` is preserved each round for graphs
    where every node has out-edges.

    Graphs with at most ``small_graph_max_edges`` edges (counted with
    one cheap aggregate) are solved driver-side; larger graphs run the
    checkpointed distributed rounds. Pass ``small_graph_max_edges=0``
    to force the distributed path."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if small_graph_max_edges > 0:
        n_edges = e.limit(small_graph_max_edges + 1).count()
        if n_edges <= small_graph_max_edges:
            rows = _driver_pagerank(
                [(r["src"], r["dst"]) for r in e.collect()], damping, iters
            )
            return e.sparkSession.createDataFrame(
                rows, "node long, rank double"
            )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    ew = truncate(e.join(deg, "src"))
    nodes = ew.select(F.col("src").alias("node")).distinct()
    n = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("double").alias("n")))
    ranks = truncate(
        nodes.crossJoin(n).select("node", (F.lit(1.0) / F.col("n")).alias("rank"), "n")
    )
    for _ in range(iters):
        contrib = ew.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("deg")).alias("c"),
            "n",
        )
        new = contrib.groupBy("node", "n").agg(F.sum("c").alias("s")).select(
            "node",
            (
                (1.0 - damping) / F.col("n") + F.lit(damping) * F.col("s")
            ).alias("rank"),
            "n",
        )
        prev = ranks
        ranks = truncate(new)
        release(prev)
    out = ranks.select("node", "rank")
    release(ew)
    return out

"""Fixed-iteration PageRank on a DataFrame edge list.

Corpus-curation use: rank domains/items in a link or co-engagement
graph to weight sampling (the CommonCrawl-style "harmonic/centrality
rank" signal used to prioritize crawl data). Power iteration:

    r_{t+1}(v) = (1 - d) / N + d * sum_{u->v} r_t(u) / deg(u)

Node universe is src ∪ dst on BOTH execution paths, so a directed
edge list gets identical answers from the driver and distributed
strategies (nodes with no in-edges keep the (1-d)/N floor; nodes with
no out-edges contribute nothing — dangling mass is NOT redistributed,
identically on both paths; symmetric graphs, which the registered
query feeds, have neither case and conserve sum(rank) == 1).

Spark-first shape (same iterative discipline as
``operators/components.py``):

- the input edge projection is PERSISTED once (it has up to four
  consumers: edge count, degree aggregate, edge⋈degree build, node
  universe) and released as soon as those materialize;
- each iteration is one join (ranks ⋈ edges on src), one aggregation
  (sum contributions keyed by dst), and one left join back onto the
  node universe — shuffles on long keys only;
- every round's rank table is ``truncate``-checkpointed and the
  previous round's blocks are released eagerly, so lineage stays O(1)
  and memory O(|nodes|) regardless of iteration count;
- fixed iteration count (deterministic, oracle-matchable) rather than
  convergence-epsilon — the caller picks iters; rank error decays as
  d^t.
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

_RANK_SCHEMA = "node long, rank double"


def _driver_pagerank(edge_rows, damping: float, iters: int):
    """Power iteration over collected (src, dst) rows with numpy.
    Node universe = src ∪ dst; no dangling redistribution."""
    import numpy as np

    nodes = sorted({r[0] for r in edge_rows} | {r[1] for r in edge_rows})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return []
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
    edge list; empty input yields an empty result on either path.

    Graphs with at most ``small_graph_max_edges`` edges are solved
    driver-side; larger graphs run the checkpointed distributed
    rounds. Pass ``small_graph_max_edges=0`` to force the distributed
    path. Both paths use the same node universe and formula — the
    threshold changes strategy, never results (equality-tested)."""
    spark = edges.sparkSession
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # the edge projection has several consumers below (count, collect
    # OR degree/edge-build/node-universe) — persist it instead of
    # re-running the caller's (possibly expensive) upstream pipeline
    # per consumer (SCALE.md: cache multi-consumer projections)
    e = e.persist()
    if small_graph_max_edges > 0:
        n_edges = e.limit(small_graph_max_edges + 1).count()
        if n_edges <= small_graph_max_edges:
            rows = _driver_pagerank(
                [(r["src"], r["dst"]) for r in e.collect()], damping, iters
            )
            e.unpersist()
            return spark.createDataFrame(rows, _RANK_SCHEMA)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    ew = truncate(e.join(deg, "src"))
    nodes = truncate(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    e.unpersist()
    n = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("double").alias("n")))
    base = nodes.crossJoin(n)
    ranks = truncate(base.select("node", (F.lit(1.0) / F.col("n")).alias("rank")))
    for _ in range(iters):
        contrib = ew.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        new = base.join(sums, "node", "left").select(
            "node",
            (
                (1.0 - damping) / F.col("n")
                + F.lit(damping) * F.coalesce("s", F.lit(0.0))
            ).alias("rank"),
        )
        prev = ranks
        ranks = truncate(new)
        release(prev)
    release(ew)
    # the node-universe checkpoint feeds every round's base — it stays
    # alive behind the returned ranks' lineage only through `base`,
    # which is no longer needed once the final ranks are materialized
    release(nodes)
    return ranks

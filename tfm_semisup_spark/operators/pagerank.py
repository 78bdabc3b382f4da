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


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations over the directed
    edge list. ``sum(rank) == 1`` is preserved each round for graphs
    where every node has out-edges."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
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

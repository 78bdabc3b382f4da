"""Graph analytics #3: multi-source BFS, co-occurrence cosine,
personalized PageRank, recursive-CTE reachability, and — added r9 —
Newman degree assortativity over the co-ordered-parts graph and
hash-deterministic DeepWalk-style random walks.

Extends the graph family (connected components, PageRank, triangle
counts, k-core, label propagation) with more staples, starting with:

- ``item_bfs_hop_distance``: multi-source breadth-first search — the
  shortest hop count from a deterministic seed set (items ≡ 0 mod 7)
  within a FIXED number of synchronous rounds. Fixed rounds — not
  run-to-convergence — keep the operator exactly SQL-expressible, so
  the DuckDB oracle is the same frontier expansion unrolled as a CTE
  chain (the k-core/PageRank discipline, ``graph2.py``). This is the
  reachability/influence-radius primitive (seed-set influence,
  taint/contamination spread, nearest-labeled-example distance).
- ``item_cooccurrence_cosine``: item-item cosine similarity from the
  binary user-item engagement matrix — cos(a,b) =
  |U_a ∩ U_b| / sqrt(|U_a|·|U_b|) — the implicit-feedback
  collaborative-filtering / "related items" normalization of the raw
  co-visitation counts (``analytics.item_cooccurrence_topk``).

Spark-first / 100 TB shape:
- both reuse ``analytics._cooc_pairs`` (per-user COOC_CAP-capped
  engagement sets — the cap bounds pairs per user at C(20,2), so the
  pair shuffle scales with users, never users×items²);
- BFS: the edge list is localCheckpoint-materialized ONCE (reused by
  all rounds + the seed derivation) and each round is one key-shuffle
  join (reached → neighbors) feeding one MIN aggregate over
  (reached ∪ neighbors) — shuffles scale with |edges|. Because the
  round count is FIXED (_BFS_ROUNDS), the whole search is ONE
  statically-bounded plan: no intra-round checkpoint (that's the
  label-propagation discipline for UNBOUNDED iteration; here it only
  added a materialization job per round — measured 5.3s → 3.6s at
  sf0.1 removing them), and no frontier ``distinct()`` (the MIN
  aggregate's map-side combine already dedups — a distinct would be a
  second shuffle per round doing the same work);
- cosine: per-item engagement degrees come from ONE aggregate over the
  capped sets, broadcast-joined back onto the (item-bounded) pair
  table; sqrt IS correctly rounded by IEEE-754, so the statistic is
  bit-identical cross-engine before the defensive round-6 (SCALE.md
  "data-derived sampling rates" note).

Parity notes: hop counts, degrees, and intersection sizes are exact
integers; the only double math is the final cosine (sqrt + divide,
both correctly rounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.lineage import truncate
from tfm_semisup_spark.queries import register
from tfm_semisup_spark.queries.analytics import (
    COOC_CAP,
    _basket_pairs,
    _capped_item_sets,
    _cooc_pairs,
    _order_part_baskets,
)
from tfm_semisup_spark.queries.graph2 import _EDGES_SQL

_BFS_ROUNDS = 3
_BFS_MIN_USERS = 2  # same edge threshold as the k-core/triangle tiers
_BFS_SEED_MOD = 7

_COS_MIN_USERS = 2
_COS_TOP = 30


def _bfs_round_sql(i: int) -> str:
    """One unrolled BFS round: neighbors of everything reached through
    round i-1, MIN-merged (hops are monotone in i, so MIN over the
    union is exactly the BFS distance truncated at round i)."""
    return f"""
f{i} AS (
  SELECT DISTINCT u.d AS item FROM und u JOIN r{i - 1} r ON u.s = r.item
),
r{i} AS (
  SELECT item, MIN(hops) AS hops FROM (
    SELECT item, hops FROM r{i - 1}
    UNION ALL SELECT item, {i} AS hops FROM f{i}
  ) GROUP BY item
)"""


BFS_ORACLE = (
    "WITH "
    + _EDGES_SQL
    + f""",
und AS (
  SELECT item_a AS s, item_b AS d FROM e0
  UNION ALL SELECT item_b, item_a FROM e0
),
nodes AS (SELECT DISTINCT s AS item FROM und),
r0 AS (SELECT item, 0 AS hops FROM nodes WHERE item % {_BFS_SEED_MOD} = 0),"""
    + ",".join(_bfs_round_sql(i) for i in range(1, _BFS_ROUNDS + 1))
    + f"""
SELECT item, CAST(hops AS BIGINT) AS hops FROM r{_BFS_ROUNDS}
"""
)


@register("item_bfs_hop_distance", BFS_ORACLE)
def item_bfs_hop_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the thresholded co-engagement graph:
    (item, hops) — the minimum hop count from any seed item
    (item % {m} == 0) reachable within {r} synchronous rounds;
    unreached items are absent.""".format(m=_BFS_SEED_MOD, r=_BFS_ROUNDS)
    edges = truncate(
        _cooc_pairs(spark, sf_dir)
        .where(F.col("n_users") >= _BFS_MIN_USERS)
        .select("item_a", "item_b")
    )
    und = edges.select(
        F.col("item_a").alias("s"), F.col("item_b").alias("d")
    ).unionAll(edges.select(F.col("item_b").alias("s"), F.col("item_a").alias("d")))
    reached = (
        und.select(F.col("s").alias("item"))
        .distinct()
        .where(F.col("item") % _BFS_SEED_MOD == 0)
        .withColumn("hops", F.lit(0))
    )
    for i in range(1, _BFS_ROUNDS + 1):
        frontier = (
            und.join(reached, und.s == reached.item)
            .select(F.col("d").alias("item"))
            .withColumn("hops", F.lit(i))
        )
        reached = (
            reached.unionAll(frontier)
            .groupBy("item")
            .agg(F.min("hops").alias("hops"))
        )
    # NOTE: no release(edges) — `reached` is lazy and still reads the
    # checkpoint blocks (SCALE.md: releasing under a lazy consumer
    # throws CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND at execution).
    return reached.select("item", F.col("hops").cast("bigint").alias("hops"))


# ---------------------------------------------------------------------------
# Item-item co-occurrence cosine (implicit-feedback CF similarity)
# ---------------------------------------------------------------------------
#
# Degrees |U_x| are counts over the SAME capped engagement sets the
# pair counts come from, so the cosine is internally consistent
# (<= 1 by Cauchy-Schwarz on the binary vectors).

COSINE_ORACLE = (
    "WITH "
    + _EDGES_SQL  # e0 is unused here; DuckDB tolerates unreferenced CTEs
    + f""",
deg AS (SELECT item, COUNT(*)::BIGINT AS n FROM capped GROUP BY item)
SELECT p.item_a, p.item_b, CAST(p.n_users AS BIGINT) AS n_users,
       ROUND(CAST(p.n_users AS DOUBLE)
             / sqrt(CAST(da.n AS DOUBLE) * CAST(db.n AS DOUBLE)), 6) AS cosine
FROM pairs p
JOIN deg da ON p.item_a = da.item
JOIN deg db ON p.item_b = db.item
WHERE p.n_users >= {_COS_MIN_USERS}
ORDER BY cosine DESC, p.item_a, p.item_b
LIMIT {_COS_TOP}
"""
)


@register("item_cooccurrence_cosine", COSINE_ORACLE)
def item_cooccurrence_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top related-item pairs by binary cosine over the capped
    user-item engagement matrix: (item_a, item_b, n_users, cosine),
    ordered by the ROUNDED cosine with an (item_a, item_b) tie-break so
    the top-{k} cutoff cannot flip on ULP.""".format(k=_COS_TOP)
    pairs = _cooc_pairs(spark, sf_dir).where(F.col("n_users") >= _COS_MIN_USERS)
    # Rebuild the capped sets once more for degrees: _cooc_pairs does
    # not expose its intermediate, and recomputing the (user-bounded)
    # aggregate is cheaper at scale than materializing it for two
    # consumers of different shapes. r14: the rebuild shares the fused
    # _capped_item_sets aggregate (no window, no self-join).
    deg = (
        _capped_item_sets(spark, sf_dir)
        .select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    da = deg.select(F.col("item").alias("ia"), F.col("n").alias("na"))
    db = deg.select(F.col("item").alias("ib"), F.col("n").alias("nb"))
    cosine = F.round(
        F.col("n_users").cast("double")
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
        6,
    )
    return (
        pairs.join(F.broadcast(da), pairs.item_a == F.col("ia"))
        .join(F.broadcast(db), pairs.item_b == F.col("ib"))
        .select(
            "item_a",
            "item_b",
            F.col("n_users").cast("bigint").alias("n_users"),
            cosine.alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "item_a", "item_b")
        .limit(_COS_TOP)
    )


# ---------------------------------------------------------------------------
# Recursive-CTE reachability (the SQL-API surface for iteration)
# ---------------------------------------------------------------------------
#
# Spark 4 ships WITH RECURSIVE (SPARK-24497): the same 2-hop seed
# reachability as the DataFrame BFS above, but expressed as ONE SQL
# string over temp views — exercising the recursive SQL surface
# itself. DuckDB runs the IDENTICAL recursive clause over its CTE
# chain, so this is a true same-dialect parity check, not a
# re-derivation. Depth is bounded in the recursion's WHERE (hops < 2):
# recursion enumerates PATHS, so an unbounded walk over a cyclic graph
# never terminates — the bound plus the outer MIN(hops) is the
# standard cycle-safe form. Path count is Σ_seeds deg^2 — fine at
# 2 hops, which is why deeper traversals use the per-round MIN-merged
# DataFrame BFS instead (rows stay one-per-node there).

_REC_DEPTH = 2

_RECURSIVE_CLAUSE = f"""
reach(item, hops) AS (
  SELECT item, 0 AS hops FROM {{seeds}}
  UNION ALL
  SELECT u.d AS item, r.hops + 1 AS hops
  FROM reach r JOIN {{und}} u ON u.s = r.item
  WHERE r.hops < {_REC_DEPTH}
)
SELECT item, CAST(MIN(hops) AS BIGINT) AS hops FROM reach GROUP BY item
"""

RECURSIVE_REACH_ORACLE = (
    "WITH RECURSIVE "
    + _EDGES_SQL
    + f""",
und AS (
  SELECT item_a AS s, item_b AS d FROM e0
  UNION ALL SELECT item_b, item_a FROM e0
),
seeds AS (
  SELECT DISTINCT s AS item FROM und WHERE s % {_BFS_SEED_MOD} = 0
),"""
    + _RECURSIVE_CLAUSE.format(seeds="seeds", und="und")
)


@register("recursive_sql_reach_two_hop", RECURSIVE_REACH_ORACLE)
def recursive_sql_reach_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop seed reachability via Spark's WITH RECURSIVE — the same
    recursive clause text DuckDB runs: (item, hops)."""
    edges = _cooc_pairs(spark, sf_dir).where(
        F.col("n_users") >= _BFS_MIN_USERS
    )
    und = edges.select(
        F.col("item_a").alias("s"), F.col("item_b").alias("d")
    ).unionAll(
        edges.select(F.col("item_b").alias("s"), F.col("item_a").alias("d"))
    )
    seeds = (
        und.select(F.col("s").alias("item"))
        .distinct()
        .where(F.col("item") % _BFS_SEED_MOD == 0)
    )
    und.createOrReplaceTempView("r8_recursive_und")
    seeds.createOrReplaceTempView("r8_recursive_seeds")
    return spark.sql(
        "WITH RECURSIVE "
        + _RECURSIVE_CLAUSE.format(
            seeds="r8_recursive_seeds", und="r8_recursive_und"
        )
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (seed-restart random walk)
# ---------------------------------------------------------------------------
#
# The recommendation/expansion twin of item_pagerank: teleport mass
# goes to the SEED SET (items ≡ 0 mod 7) instead of uniformly — ranks
# measure proximity to the seeds (related-item expansion, topic-biased
# crawl ranking; Page et al.'s personalization vector). Same fixed
# power iteration and parity discipline as analytics.item_pagerank
# (unrolled-CTE oracle, per-node in-neighbor sums rounded at 8 dp
# before the top-k cut, item tie-break); same iterative Spark shape
# (edges checkpointed ONCE, per-round truncate/release, O(1) lineage).
# Nodes unreached by the walk keep rank exactly 0.0 on both engines
# (0.15·0 + 0.85·COALESCE(NULL,0) — no float drift possible) and stay
# comparable.

_PPR_ITERS = 5
_PPR_DAMPING = 0.85
_PPR_TOP = 20


def _ppr_oracle() -> str:
    head = (
        "WITH "
        + _EDGES_SQL
        + f""",
e AS (
  SELECT item_a AS src, item_b AS dst FROM e0
  UNION ALL SELECT item_b, item_a FROM e0
),
deg AS (SELECT src, COUNT(*)::DOUBLE AS deg FROM e GROUP BY src),
nodes AS (
  SELECT DISTINCT src AS node FROM e
),
seeds AS (SELECT node FROM nodes WHERE node % {_BFS_SEED_MOD} = 0),
ns AS (SELECT COUNT(*)::DOUBLE AS ns FROM seeds),
s AS (
  SELECT n.node,
         CASE WHEN sd.node IS NOT NULL THEN 1.0 / t.ns ELSE 0.0 END AS s
  FROM nodes n LEFT JOIN seeds sd ON n.node = sd.node CROSS JOIN ns t
),
r0 AS (SELECT node, s AS rank FROM s)"""
    )
    rounds = "".join(
        f""",
c{k} AS (
  SELECT e.dst AS node, SUM(r.rank / d.deg) AS c
  FROM e JOIN r{k - 1} r ON r.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT s.node,
         {1.0 - _PPR_DAMPING} * s.s
           + {_PPR_DAMPING} * COALESCE(c.c, 0.0) AS rank
  FROM s LEFT JOIN c{k} c ON s.node = c.node
)"""
        for k in range(1, _PPR_ITERS + 1)
    )
    tail = f"""
SELECT node AS item, round(rank, 8) AS rank
FROM r{_PPR_ITERS}
ORDER BY round(rank, 8) DESC, node
LIMIT {_PPR_TOP}
"""
    return head + rounds + tail


PPR_ORACLE = _ppr_oracle()


@register("item_personalized_pagerank", PPR_ORACLE)
def item_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} items by seed-personalized PageRank over the symmetric
    co-engagement graph: (item, rank); teleport mass restarts at items
    ≡ 0 mod {m}.""".format(k=_PPR_TOP, m=_BFS_SEED_MOD)
    from tfm_semisup_spark.operators.lineage import release

    pairs = truncate(
        _cooc_pairs(spark, sf_dir)
        .where(F.col("n_users") >= _BFS_MIN_USERS)
        .select("item_a", "item_b")
    )
    e = pairs.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    ew = truncate(e.join(deg, "src"))
    nodes = e.select(F.col("src").alias("node")).distinct()
    ns = F.broadcast(
        nodes.where(F.col("node") % _BFS_SEED_MOD == 0).agg(
            F.count(F.lit(1)).cast("double").alias("ns")
        )
    )
    base = truncate(
        nodes.crossJoin(ns).select(
            "node",
            F.when(
                F.col("node") % _BFS_SEED_MOD == 0, F.lit(1.0) / F.col("ns")
            )
            .otherwise(F.lit(0.0))
            .alias("s"),
        )
    )
    # the initial ranks must be their OWN checkpoint: release(prev) on
    # round 1 walks prev's plan for a checkpoint scan to free, and a
    # lazy projection over `base` would hand it base's blocks — which
    # every later round still reads (the SCALE.md lazy-consumer trap,
    # reproduced here before this truncate was added)
    ranks = truncate(base.select("node", F.col("s").alias("rank")))
    for _ in range(_PPR_ITERS):
        contrib = ew.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("deg")).alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("c"))
        new = base.join(sums, "node", "left").select(
            "node",
            (
                F.lit(1.0 - _PPR_DAMPING) * F.col("s")
                + F.lit(_PPR_DAMPING) * F.coalesce("c", F.lit(0.0))
            ).alias("rank"),
        )
        prev = ranks
        ranks = truncate(new)
        release(prev)
    out = truncate(
        ranks.select(
            F.col("node").alias("item"), F.round("rank", 8).alias("rank")
        )
        .orderBy(F.col("rank").desc(), "item")
        .limit(_PPR_TOP)
    )
    release(pairs)
    release(ew)
    release(base)
    release(ranks)
    return out


# ---------------------------------------------------------------------------
# Degree assortativity of the co-ordered part graph
# ---------------------------------------------------------------------------
#
# Newman's degree assortativity coefficient (Newman 2002 — "Assortative
# mixing in networks") over the UNDIRECTED co-order graph: nodes are
# parts, an edge connects parts that appear in at least one common
# order. r is the Pearson correlation of (deg(u), deg(v)) taken over
# the directed edge list (each undirected edge contributing both
# orientations — the standard symmetric formulation). Positive r:
# popular parts co-order with popular parts (rich-club); negative:
# hub-and-spoke baskets.
#
# 100 TB shape: the pair fan-out is bounded by basket width, exactly
# the basket_part_lift argument (C(lines,2) per order, never parts²);
# degrees come from ONE groupBy over the directed edge list; the
# correlation is assembled from five exact-integer sums
# (DECIMAL(38,0)/HUGEINT — products reach m·deg² ≈ 10^20+) in a fixed
# double tree. Output is a single row — no collect anywhere.

ASSORT_ORACLE = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
),
und AS (
  SELECT DISTINCT a.part AS pa, b.part AS pb
  FROM op a JOIN op b ON a.okey = b.okey AND a.part < b.part
),
deg AS (
  SELECT part, COUNT(*)::HUGEINT AS d FROM (
    SELECT pa AS part FROM und UNION ALL SELECT pb AS part FROM und
  ) GROUP BY part
),
sums AS (
  SELECT 2 * COUNT(*)::HUGEINT AS m,
         SUM(da.d + db.d) AS s,
         SUM(da.d * db.d) AS sxy2,
         SUM(da.d * da.d + db.d * db.d) AS sxx
  FROM und
  JOIN deg da ON und.pa = da.part
  JOIN deg db ON und.pb = db.part
)
SELECT (SELECT COUNT(*) FROM deg)::BIGINT AS n_nodes,
       (SELECT COUNT(*) FROM und)::BIGINT AS n_edges,
       ROUND(CAST(2 * m * sxy2 - s * s AS DOUBLE)
             / CAST(m * sxx - s * s AS DOUBLE), 6) AS assortativity
FROM sums
"""


@register("part_degree_assortativity", ASSORT_ORACLE)
def part_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-ordered-parts graph:
    (n_nodes, n_edges, assortativity)."""
    # r14: the DISTINCT(okey,part) + okey self-join pair derivation is
    # now ONE basket aggregate + a narrow suffix-explode Generate
    # (analytics._basket_pairs, guide §2.4) — identical pair multiset,
    # one less exchange, no join
    und = _basket_pairs(_order_part_baskets(spark, sf_dir)).distinct()
    # the edge list feeds several downstream references (degrees, the
    # moment sums, the edge count) — checkpoint once so the
    # pair generation+distinct runs once, not four times (6.4s -> 3.8s
    # in the r9 self-join form); the symmetric-sum rewrite below then
    # halves the join volume again (3.8s -> ~2.3s, SCALE.md)
    und = truncate(und, eager=True)
    deg = (
        und.select(F.col("pa").alias("part"))
        .unionAll(und.select(F.col("pb").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("d"))
    )
    # directed sums from the UNDIRECTED list by symmetry: over both
    # orientations Σdeg(src) = Σ_und(da+db), Σdeg(src)² = Σ_und(da²+db²),
    # Σdeg(src)deg(dst) = 2Σ_und(da·db); and since the x/y marginals are
    # identical, r = (m·Sxy − s²)/(m·Sxx − s²) — no sqrt at all
    da = deg.select(F.col("part").alias("pa"), F.col("d").alias("da"))
    db = deg.select(F.col("part").alias("pb"), F.col("d").alias("db"))
    sums = (
        und.join(da, "pa")
        .join(db, "pb")
        .agg(
            (2 * F.count(F.lit(1))).cast("decimal(38,0)").alias("m"),
            F.sum(F.col("da") + F.col("db")).alias("s"),
            F.sum(F.col("da") * F.col("db")).alias("sxy2"),
            F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db")).alias(
                "sxx"
            ),
        )
    )
    counts = und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    num = (2 * F.col("m") * F.col("sxy2") - F.col("s") * F.col("s")).cast(
        "double"
    )
    den = (F.col("m") * F.col("sxx") - F.col("s") * F.col("s")).cast("double")
    return sums.crossJoin(F.broadcast(counts)).select(
        "n_nodes",
        "n_edges",
        F.round(num / den, 6).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Hash-deterministic random walks (DeepWalk-style sampling)
# ---------------------------------------------------------------------------
#
# The graph-embedding training primitive (Perozzi et al. 2014,
# DeepWalk): sample fixed-length walks to feed a skip-gram model. RNG
# walks are not oracle-checkable, so the next-step choice is
# HASH-DETERMINISTIC: from node v at step t, move to the neighbor d
# minimizing md5(v || '-' || d || '-' || t) — a uniform-ish but fully
# reproducible pick both engines compute identically (hex digests
# compare lexicographically the same in Spark and DuckDB, and argmin
# is min_by/arg_min on both). The choice hashes (node, step) — not
# the walk id — so all walks at the same node and step agree; that is
# intentional (one functional-graph per step ⇒ the whole walk table
# derives from |V| argmin aggregates per step, not |walks| RNG draws,
# and re-deriving a shard of walks is pure recomputation).
#
# 100 TB shape: the edge list is checkpointed once; each step is one
# key-shuffle join + one (node-bounded) argmin aggregate. Walk count
# scales with seed nodes, never edges².

_WALK_STEPS = 3
_WALK_SEED_MOD = 5


def _walk_dig(v: str, d: str, t: int) -> str:
    return (
        f"md5(CAST({v} AS STRING) || '-' || CAST({d} AS STRING) "
        f"|| '-' || '{t}')"
    )


def _walk_oracle() -> str:
    steps = []
    prev = "v0"
    for t in range(1, _WALK_STEPS + 1):
        steps.append(f"""
w{t} AS (
  SELECT w.start_item, {", ".join(f"w.v{i}" for i in range(t))},
         arg_min(u.d, {_walk_dig(f"w.v{t-1}", "u.d", t)}) AS v{t}
  FROM w{t-1} w JOIN und u ON w.v{t-1} = u.s
  GROUP BY w.start_item{"".join(f", w.v{i}" for i in range(t))}
)""")
        prev = f"w{t}"
    cols = ", ".join(f"v{i}" for i in range(1, _WALK_STEPS + 1))
    return (
        "WITH "
        + _EDGES_SQL
        + f""",
und AS (
  SELECT item_a AS s, item_b AS d FROM e0
  UNION ALL SELECT item_b, item_a FROM e0
),
w0 AS (
  SELECT DISTINCT s AS start_item, s AS v0 FROM und
  WHERE s % {_WALK_SEED_MOD} = 0
),"""
        + ",".join(steps)
        + f"""
SELECT start_item, {cols} FROM w{_WALK_STEPS}
"""
    )


@register("item_hash_random_walks", _walk_oracle())
def item_hash_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic {n}-step walks from seed items (% {m} == 0)
    over the co-engagement graph: (start_item, v1..v{n}).""".format(
        n=_WALK_STEPS, m=_WALK_SEED_MOD
    )
    edges = truncate(
        _cooc_pairs(spark, sf_dir)
        .where(F.col("n_users") >= _BFS_MIN_USERS)
        .select("item_a", "item_b")
    )
    und = edges.select(
        F.col("item_a").alias("s"), F.col("item_b").alias("d")
    ).unionAll(
        edges.select(F.col("item_b").alias("s"), F.col("item_a").alias("d"))
    )
    walk = (
        und.select(F.col("s").alias("start_item"), F.col("s").alias("v0"))
        .distinct()
        .where(F.col("start_item") % _WALK_SEED_MOD == 0)
    )
    for t in range(1, _WALK_STEPS + 1):
        prev_cols = ["start_item"] + [f"v{i}" for i in range(t)]
        dig = F.expr(_walk_dig(f"v{t-1}", "d", t))
        walk = (
            walk.join(und, walk[f"v{t-1}"] == und.s)
            .groupBy(*prev_cols)
            .agg(F.min_by("d", dig).alias(f"v{t}"))
        )
    return walk.select(
        "start_item", *[f"v{i}" for i in range(1, _WALK_STEPS + 1)]
    )


# ---------------------------------------------------------------------------
# HITS hubs/authorities, two unrolled iterations (r10)
# ---------------------------------------------------------------------------
#
# Kleinberg's HITS (1999) on the weighted supplier->part bipartite
# graph (edge weight = lineitem count): hubs are suppliers, authorities
# parts. Two mutual-reinforcement iterations unrolled as aggregates —
# the item_pagerank power-iteration discipline — with NORMALIZATION
# DEFERRED: scores stay exact integers (DECIMAL(38,0)/HUGEINT)
#   hub1(s)  = Σ_e w               (weighted out-degree)
#   auth1(p) = Σ_{(s,p)} w·hub1(s)
#   hub2(s)  = Σ_{(s,p)} w·auth1(p)
#   auth2(p) = Σ_{(s,p)} w·hub2(s)
# (the per-iteration L2 normalization of textbook HITS is a positive
# scalar per side, so the RANKING after k integer iterations is
# identical — and integer scores are the order-free, oracle-exact
# form). Magnitude bound: auth2 ≤ (Σw)³ < 10^38 through sf10.
#
# Scale shape: the edge list aggregates once (one shuffle keyed
# (supplier, part)) and is checkpointed; each iteration is a broadcast
# join of the ≤|suppliers| or ≤|parts| score table onto the edges plus
# one keyed aggregate — 1 shuffle per half-iteration, O(1) lineage,
# exactly the pagerank cost model. Top-10 by (auth2 desc, part) is a
# TakeOrderedAndProject, never a global sort.

HITS_ORACLE = """
WITH edges AS (
  SELECT l_suppkey AS s, l_partkey AS p, COUNT(*)::HUGEINT AS w
  FROM lineitem GROUP BY 1, 2
),
hub1 AS (SELECT s, SUM(w) AS h1 FROM edges GROUP BY s),
auth1 AS (
  SELECT e.p, SUM(e.w * hub1.h1) AS a1
  FROM edges e JOIN hub1 ON e.s = hub1.s GROUP BY e.p
),
hub2 AS (
  SELECT e.s, SUM(e.w * auth1.a1) AS h2
  FROM edges e JOIN auth1 ON e.p = auth1.p GROUP BY e.s
),
auth2 AS (
  SELECT e.p, SUM(e.w * hub2.h2) AS a2
  FROM edges e JOIN hub2 ON e.s = hub2.s GROUP BY e.p
)
SELECT p AS part, a2::BIGINT AS authority_score
FROM auth2
ORDER BY a2 DESC, p
LIMIT 10
"""


@register("part_hits_authorities", HITS_ORACLE)
def part_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 HITS authorities after two exact-integer iterations on
    the supplier->part graph: (part, authority_score)."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = truncate(
        li.groupBy(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
        ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("w")),
        eager=True,
    )
    hub1 = edges.groupBy("s").agg(F.sum("w").alias("h1"))
    auth1 = (
        edges.join(F.broadcast(hub1), "s")
        .groupBy("p")
        .agg(F.sum(F.col("w") * F.col("h1")).alias("a1"))
    )
    hub2 = (
        edges.join(F.broadcast(auth1), "p")
        .groupBy("s")
        .agg(F.sum(F.col("w") * F.col("a1")).alias("h2"))
    )
    auth2 = (
        edges.join(F.broadcast(hub2), "s")
        .groupBy("p")
        .agg(F.sum(F.col("w") * F.col("h2")).alias("a2"))
    )
    return (
        auth2.orderBy(F.col("a2").desc(), "p")
        .limit(10)
        .select(
            F.col("p").alias("part"),
            F.col("a2").cast("bigint").alias("authority_score"),
        )
    )

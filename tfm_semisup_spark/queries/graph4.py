"""Graph analytics #4: neighborhood-based link prediction.

``item_link_prediction_ra`` scores NON-edges of the co-engagement
graph by their shared-neighborhood structure — the classic
link-prediction / related-item-candidate readout (Liben-Nowell &
Kleinberg 2003). Three standard scores per candidate pair:

- common-neighbor count |Γ(x) ∩ Γ(y)|;
- resource-allocation index Σ_z 1/deg(z) over common neighbors z
  (Zhou, Lü & Zhang 2009 — the rational-arithmetic cousin of
  Adamic-Adar's Σ 1/ln deg, chosen here because 1/deg quantizes to an
  EXACT integer, where 1/ln(deg) would hang a floor() on a libm ULP);
- Jaccard |Γ(x) ∩ Γ(y)| / |Γ(x) ∪ Γ(y)|.

No reference analog (Dguipla/TFM-SemiSup has no graph surface); the
edge derivation is the shared capped co-visitation graph of
``analytics._cooc_pairs`` (same CTEs as the triangle/PageRank/k-core
family).

Spark-first / 100 TB shape:
- the wedge join (adjacency self-join on the shared neighbor z) is
  the triangle query's bounded shape: per-user engagement sets are
  capped at COOC_CAP before pairing and edges need >= LP_MIN_USERS
  supporting users, so Σ deg(z)² is bounded; at web scale the extra
  lever is the same degree-orientation trick noted on the triangle
  query.
- scores are exact BIGINT arithmetic end-to-end (integer floor
  division: ``div`` on Spark, ``//`` on DuckDB) — no doubles, so no
  rounding convention is even needed.
- the final top-k is an (order, limit) = TakeOrderedAndProject with a
  total tie-break order (scores DESC, then the unique pair key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.queries import register
from tfm_semisup_spark.queries.analytics import (
    COOC_CAP,
    _basket_pairs,
    _cooc_pairs,
    _order_part_baskets,
)

LP_MIN_USERS = 2
LP_TOP = 20
_RA_SCALE = 1_000_000_000  # 10^9 / deg per common neighbor
_JAC_SCALE = 1_000_000  # 10^6 · cn / (deg_x + deg_y − cn)

_LPA_ROUNDS = 3
_LPA_TOP = 15

_EDGE_CTES = f"""
engaged AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         COUNT(*)::BIGINT AS cnt
  FROM events
  WHERE event_type IN ('view', 'click')
  GROUP BY user_id, item
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY cnt DESC, item
           ) AS rk
    FROM engaged
  ) WHERE rk <= {COOC_CAP}
),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*)::BIGINT AS n_users
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item
),
edges AS (
  SELECT item_a, item_b FROM pairs WHERE n_users >= {LP_MIN_USERS}
),
adj AS (
  SELECT item_a AS u, item_b AS v FROM edges
  UNION ALL SELECT item_b, item_a FROM edges
)"""

# Reuses _EDGE_CTES (the LPA oracle's edge derivation) verbatim —
# adj(u, v) aliased to the z/x wedge roles downstream, so the shared
# edge semantics exist ONCE (ADVICE r11).
LINKPRED_ORACLE = f"""
WITH {_EDGE_CTES},
deg AS (SELECT u AS z, COUNT(*)::BIGINT AS deg FROM adj GROUP BY u),
wedge AS (
  SELECT a1.v AS item_a, a2.v AS item_b, a1.u AS z
  FROM adj a1 JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
),
cand AS (
  SELECT w.item_a, w.item_b,
         COUNT(*)::BIGINT AS cn,
         SUM({_RA_SCALE} // d.deg)::BIGINT AS ra_q
  FROM wedge w JOIN deg d ON w.z = d.z
  GROUP BY w.item_a, w.item_b
),
nonedge AS (
  SELECT c.item_a, c.item_b, c.cn, c.ra_q
  FROM cand c
  LEFT JOIN edges e ON e.item_a = c.item_a AND e.item_b = c.item_b
  WHERE e.item_a IS NULL
)
SELECT n.item_a, n.item_b,
       n.cn AS common_neighbors,
       n.ra_q AS ra_score_q,
       CAST((n.cn * {_JAC_SCALE}) // (da.deg + db.deg - n.cn) AS BIGINT)
         AS jaccard_q
FROM nonedge n
JOIN deg da ON da.z = n.item_a
JOIN deg db ON db.z = n.item_b
ORDER BY common_neighbors DESC, ra_score_q DESC, n.item_a, n.item_b
LIMIT {LP_TOP}
"""


@register("item_link_prediction_ra", LINKPRED_ORACLE)
def item_link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{LP_TOP} predicted links of the co-engagement graph:
    (item_a, item_b, common_neighbors, ra_score_q, jaccard_q) over
    candidate non-edges sharing >= 1 neighbor — exact BIGINT scores."""
    edges = (
        _cooc_pairs(spark, sf_dir)
        .where(F.col("n_users") >= LP_MIN_USERS)
        .select("item_a", "item_b")
    )
    # one upstream evaluation feeds adjacency, degrees, and the
    # anti-join probe (the triangle-query discipline)
    edges = edges.localCheckpoint(eager=True)
    adj = edges.select(
        F.col("item_a").alias("z"), F.col("item_b").alias("x")
    ).unionAll(
        edges.select(F.col("item_b").alias("z"), F.col("item_a").alias("x"))
    )
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    a1 = adj.select(F.col("z"), F.col("x").alias("item_a"))
    a2 = adj.select(F.col("z").alias("z2"), F.col("x").alias("item_b"))
    wedge = a1.join(a2, (F.col("z") == F.col("z2"))).where(
        F.col("item_a") < F.col("item_b")
    )
    cand = (
        wedge.join(F.broadcast(deg), "z")
        .groupBy("item_a", "item_b")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(F.expr(f"{_RA_SCALE} div deg")).alias("ra_q"),
        )
    )
    nonedge = cand.join(edges, ["item_a", "item_b"], "left_anti")
    da = deg.select(F.col("z").alias("item_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("z").alias("item_b"), F.col("deg").alias("deg_b"))
    scored = (
        nonedge.join(F.broadcast(da), "item_a")
        .join(F.broadcast(db), "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("cn").alias("common_neighbors"),
            F.col("ra_q").alias("ra_score_q"),
            F.expr(f"(cn * {_JAC_SCALE}) div (deg_a + deg_b - cn)")
            .cast("bigint")
            .alias("jaccard_q"),
        )
    )
    return scored.orderBy(
        F.col("common_neighbors").desc(),
        F.col("ra_score_q").desc(),
        "item_a",
        "item_b",
    ).limit(LP_TOP)


# ---------------------------------------------------------------------------
# Community detection: synchronous label propagation (fixed rounds)
# ---------------------------------------------------------------------------
#
# Raghavan, Albert & Kumara 2007 made deterministic: labels start as
# the node id; each SYNCHRONOUS round every node adopts its neighbor
# multiset's most frequent label with the (count DESC, label ASC)
# total tie-break (the paper breaks ties randomly; a deterministic
# tie-break is what makes the operator oracle-checkable and
# partitioning-independent). Fixed _LPA_ROUNDS rounds — not
# run-to-convergence — so the oracle is the same loop unrolled as a
# CTE chain (the PageRank/k-core/BFS discipline). Complements the
# family: components find CONNECTIVITY, k-core finds density, LPA
# finds label-majority communities inside a component.
#
# 100 TB shape: per round, one |adj|-keyed join against the bounded
# label table + one (node, label) hash aggregate + one per-node top-1
# window — two shuffles per round, O(1) lineage via per-round
# localCheckpoint on Spark.


def _lpa_round_sql(i: int) -> str:
    return f"""
nb{i} AS (
  SELECT a.u AS node, l.lab, COUNT(*)::BIGINT AS c
  FROM adj a JOIN l{i - 1} l ON a.v = l.node
  GROUP BY a.u, l.lab
),
l{i} AS (
  SELECT node, lab FROM (
    SELECT node, lab,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY c DESC, lab) AS rk
    FROM nb{i}
  ) WHERE rk = 1
)"""


def _lpa_oracle() -> str:
    rounds = "".join("," + _lpa_round_sql(i) for i in range(1, _LPA_ROUNDS + 1))
    return f"""
WITH {_EDGE_CTES},
l0 AS (SELECT DISTINCT u AS node, u AS lab FROM adj){rounds}
SELECT lab AS community,
       COUNT(*)::BIGINT AS n_members,
       MIN(node) AS min_item,
       MAX(node) AS max_item
FROM l{_LPA_ROUNDS}
GROUP BY lab
ORDER BY n_members DESC, community
LIMIT {_LPA_TOP}
"""


@register("item_community_lpa", _lpa_oracle())
def item_community_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_LPA_TOP} label-propagation communities after
    {_LPA_ROUNDS} synchronous rounds: (community, n_members, min_item,
    max_item)."""
    edges = (
        _cooc_pairs(spark, sf_dir)
        .where(F.col("n_users") >= LP_MIN_USERS)
        .select("item_a", "item_b")
    )
    adj = edges.select(
        F.col("item_a").alias("u"), F.col("item_b").alias("v")
    ).unionAll(
        edges.select(F.col("item_b").alias("u"), F.col("item_a").alias("v"))
    )
    adj = adj.localCheckpoint(eager=True)
    labels = adj.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(_LPA_ROUNDS):
        nb = (
            adj.join(
                labels.select(
                    F.col("node").alias("v"), F.col("lab")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # r14 (guide §2.4): the per-round argmax label was a rk=1
        # row_number window (one exchange + full per-node sort per
        # round); max_by over struct (c, -lab) is the identical
        # (c DESC, lab ASC) pick as a map-side-combinable aggregate
        labels = nb.groupBy("node").agg(
            F.max_by(
                "lab", F.struct(F.col("c"), (-F.col("lab")).alias("nl"))
            ).alias("lab")
        )
        # O(1) lineage across rounds (the PageRank discipline)
        labels = labels.localCheckpoint(eager=True)
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min("node").alias("min_item"),
            F.max("node").alias("max_item"),
        )
        .orderBy(F.col("n_members").desc(), "community")
        .limit(_LPA_TOP)
    )


# ---------------------------------------------------------------------------
# Nominal-attribute assortativity (brand mixing matrix)
# ---------------------------------------------------------------------------
#
# Newman 2003 ("Mixing patterns in networks") for a CATEGORICAL
# attribute: over the co-ordered-parts graph (the degree-assortativity
# edge derivation — pair fan-out bounded by basket width), build the
# brand mixing matrix e_xy = fraction of directed edges joining brand
# x to brand y and report
#
#   r = (Tr e − Σ_x a_x b_x) / (1 − Σ_x a_x b_x)
#
# with a = row sums = b (symmetrized edges). r > 0: brands co-order
# within themselves (assortative); r < 0: cross-brand baskets.
# Everything is exact integer until ONE double division:
# r = (Tr·M − Σ rowsum²) / (M² − Σ rowsum²) clears all denominators
# (DECIMAL(38,0)/HUGEINT — M² passes BIGINT at ~3·10⁹ directed edges).

BRAND_ASSORT_ORACLE = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
),
und AS (
  SELECT DISTINCT a.part AS pa, b.part AS pb
  FROM op a JOIN op b ON a.okey = b.okey AND a.part < b.part
),
br AS (SELECT p_partkey AS part, p_brand AS brand FROM part),
dir AS (
  SELECT ba.brand AS bx, bb.brand AS by
  FROM und JOIN br ba ON und.pa = ba.part JOIN br bb ON und.pb = bb.part
  UNION ALL
  SELECT bb.brand, ba.brand
  FROM und JOIN br ba ON und.pa = ba.part JOIN br bb ON und.pb = bb.part
),
mix AS (SELECT bx, by, COUNT(*)::HUGEINT AS m FROM dir GROUP BY bx, by),
tots AS (
  SELECT SUM(m)::HUGEINT AS mm,
         SUM(CASE WHEN bx = by THEN m ELSE 0 END)::HUGEINT AS tr
  FROM mix
),
rows_ AS (SELECT bx, SUM(m)::HUGEINT AS rs FROM mix GROUP BY bx),
ab AS (SELECT SUM(rs * rs)::HUGEINT AS sab FROM rows_)
SELECT t.mm::BIGINT AS n_directed_edges,
       (SELECT COUNT(*) FROM rows_)::BIGINT AS n_brands,
       t.tr::BIGINT AS n_same_brand_edges,
       ROUND(CAST(t.tr * t.mm - a.sab AS DOUBLE)
             / CAST(t.mm * t.mm - a.sab AS DOUBLE), 6) AS assortativity
FROM tots t CROSS JOIN ab a
"""


@register("part_brand_assortativity", BRAND_ASSORT_ORACLE)
def part_brand_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nominal brand assortativity of the co-ordered-parts graph:
    one row (n_directed_edges, n_brands, n_same_brand_edges,
    assortativity)."""
    from tfm_semisup_spark.io import load_table

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part"), F.col("p_brand").alias("brand")
    )
    # r14: DISTINCT(okey,part) + okey self-join -> one basket aggregate
    # + suffix-explode Generate (analytics._basket_pairs, guide §2.4)
    und = _basket_pairs(_order_part_baskets(spark, sf_dir)).distinct()
    ba = part.select(F.col("part").alias("pa"), F.col("brand").alias("bxa"))
    bb = part.select(F.col("part").alias("pb"), F.col("brand").alias("bxb"))
    branded = und.join(F.broadcast(ba), "pa").join(F.broadcast(bb), "pb")
    branded = branded.localCheckpoint(eager=True)
    dirv = branded.select(
        F.col("bxa").alias("bx"), F.col("bxb").alias("by")
    ).unionAll(
        branded.select(F.col("bxb").alias("bx"), F.col("bxa").alias("by"))
    )
    mix = dirv.groupBy("bx", "by").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m")
    )
    mix = mix.localCheckpoint(eager=True)
    tots = mix.agg(
        F.sum("m").alias("mm"),
        F.sum(F.when(F.col("bx") == F.col("by"), F.col("m")).otherwise(0))
        .alias("tr"),
    )
    rows_ = mix.groupBy("bx").agg(F.sum("m").alias("rs"))
    ab = rows_.agg(
        F.sum(F.col("rs") * F.col("rs")).alias("sab"),
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
    )
    j = tots.crossJoin(F.broadcast(ab))
    return j.select(
        F.col("mm").cast("bigint").alias("n_directed_edges"),
        F.col("n_brands"),
        F.col("tr").cast("bigint").alias("n_same_brand_edges"),
        F.round(
            (F.col("tr") * F.col("mm") - F.col("sab")).cast("double")
            / (F.col("mm") * F.col("mm") - F.col("sab")).cast("double"),
            6,
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient (r12)
# ---------------------------------------------------------------------------
#
# The node-level density readout completing the triangle family:
# C_u = 2·T_u / (deg_u · (deg_u − 1)) where T_u counts edges between
# u's neighbors (Watts & Strogatz 1998). item_triangle_counts reports
# the graph's oriented triangles; this reports per-node coefficients —
# the feature link-prediction/community work consumes.
#
# Exact BIGINT end-to-end: T_u and deg_u are counts, and the
# coefficient quantizes as (2·T·10⁶) // (deg·(deg−1)) — integer floor
# division on both engines, no doubles anywhere.
#
# 100 TB shape: the neighbor-pair fan-out is the triangle query's
# bounded wedge join (Σ deg(u)² over COOC_CAP-capped engagement sets);
# the closing-edge probe is an equi-join against the oriented edge
# list (item_a < item_b matches x < y by construction). At web scale
# the same degree-orientation trick noted on the triangle query
# applies. Shares _EDGE_CTES / _cooc_pairs with the whole graph
# family — the edge derivation exists once.

_CC_SCALE = 1_000_000
_CC_TOP = 15

CLUSTERING_ORACLE = f"""
WITH {_EDGE_CTES},
deg AS (SELECT u, COUNT(*)::BIGINT AS deg FROM adj GROUP BY u),
nbr_pairs AS (
  SELECT a1.u AS u, a1.v AS x, a2.v AS y
  FROM adj a1 JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
),
tri AS (
  SELECT p.u, COUNT(*)::BIGINT AS t
  FROM nbr_pairs p JOIN edges e ON e.item_a = p.x AND e.item_b = p.y
  GROUP BY p.u
)
SELECT d.u AS item, d.deg,
       COALESCE(t.t, 0)::BIGINT AS triangles,
       CAST((2 * COALESCE(t.t, 0) * {_CC_SCALE})
            // (d.deg * (d.deg - 1)) AS BIGINT) AS clustering_q
FROM deg d LEFT JOIN tri t ON d.u = t.u
WHERE d.deg >= 2
ORDER BY d.deg DESC, item
LIMIT {_CC_TOP}
"""


@register("item_clustering_coefficient", CLUSTERING_ORACLE)
def item_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_CC_TOP} highest-degree items with their local clustering
    coefficients: (item, deg, triangles, clustering_q) — exact BIGINT
    wedge/closing-edge counting, coefficient quantized at 10^6."""
    edges = (
        _cooc_pairs(spark, sf_dir)
        .where(F.col("n_users") >= LP_MIN_USERS)
        .select("item_a", "item_b")
    )
    edges = edges.localCheckpoint(eager=True)
    adj = edges.select(
        F.col("item_a").alias("u"), F.col("item_b").alias("v")
    ).unionAll(
        edges.select(F.col("item_b").alias("u"), F.col("item_a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    a1 = adj.select("u", F.col("v").alias("x"))
    a2 = adj.select(F.col("u").alias("u2"), F.col("v").alias("y"))
    nbr_pairs = a1.join(a2, F.col("u") == F.col("u2")).where(
        F.col("x") < F.col("y")
    )
    closing = edges.select(
        F.col("item_a").alias("x"), F.col("item_b").alias("y")
    )
    tri = (
        nbr_pairs.join(closing, ["x", "y"])
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    out = (
        deg.join(tri, "u", "left")
        .where(F.col("deg") >= 2)
        .select(
            F.col("u").alias("item"),
            F.col("deg").cast("bigint").alias("deg"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("triangles"),
            F.expr(
                f"(2 * coalesce(t, 0) * {_CC_SCALE})"
                " div (deg * (deg - 1))"
            )
            .cast("bigint")
            .alias("clustering_q"),
        )
    )
    return out.orderBy(F.col("deg").desc(), "item").limit(_CC_TOP)

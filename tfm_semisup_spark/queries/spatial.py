"""Spatial battery: grid-blocked radius self-join (find all point
pairs within distance r).

The proximity-join primitive every geo/embedding-adjacent pipeline
needs (store-near-store, user-near-POI, duplicate-location detection).
The testdata carries no coordinate columns, so points are DERIVED
deterministically: (x, y) are two independent 16-bit uniform slices of
md5(c_custkey) (the shared ``md5_uniform16`` primitive,
``operators/layout.py`` — the bloom screen's two-slices-one-digest
trick), placing every customer in a 65536×65536 integer plane
identically in both engines.

Spark-first / 100 TB shape — GRID BLOCKING, the standard spatial-join
re-expression:
- each point lands in one r×r grid cell; a pair within distance r must
  sit in the same or an adjacent cell, so candidates are the 3×3
  neighborhood equi-join: one side is exploded ×9 onto its neighbor
  cells, the other keyed by its own cell — the join shuffles on
  (cell_x, cell_y) like any equi-join, never the all-pairs cross join
  the naive form needs (the DuckDB oracle runs exactly that naive
  O(n²) form — independent derivation, feasible at oracle scale only).
- each qualifying pair is produced EXACTLY once: the base point lies in
  one cell, and that cell appears once in the probe's 3×3 explosion —
  no DISTINCT pass needed (asserted in tests).
- skew: cell occupancy under md5 is uniform by construction; for real
  clustered data the same plan takes a salted cell key (SCALE.md skew
  discipline) — the topology is unchanged.

Parity: coordinates, cells, and squared distances are EXACT integers
end to end (the radius test compares dist² ≤ r² — no sqrt, no libm, no
ULP boundary anywhere), the reason this uses the squared-Euclidean
metric instead of haversine (trig is not correctly rounded; a
threshold compare on it can flip cross-engine — ``functions/geo.py``
haversine outputs are rounded, never compared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.layout import (
    md5_uniform16_spark_sql,
    md5_uniform16_sql,
)
from tfm_semisup_spark.queries import register

_RADIUS = 512  # plane is 65536×65536; E[pairs] ≈ πr²·n²/2A
_RADIUS_SQ = _RADIUS * _RADIUS

_MD5 = "md5(CAST(c_custkey AS STRING))"

SPATIAL_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS key,
         CAST({md5_uniform16_sql(_MD5, 1)} AS BIGINT) AS x,
         CAST({md5_uniform16_sql(_MD5, 5)} AS BIGINT) AS y
  FROM customer
)
SELECT a.key AS key_a, b.key AS key_b,
       CAST((a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
FROM pts a JOIN pts b ON a.key < b.key
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_RADIUS_SQ}
"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key, x, y, cx, cy): derived integer coordinates + grid cell."""
    spark_md5 = "md5(CAST(c_custkey AS STRING))"
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.expr(md5_uniform16_spark_sql(spark_md5, 1)).cast("bigint").alias("x"),
        F.expr(md5_uniform16_spark_sql(spark_md5, 5)).cast("bigint").alias("y"),
    ).withColumn("cx", (F.col("x") / _RADIUS).cast("int")).withColumn(
        "cy", (F.col("y") / _RADIUS).cast("int")
    )


@register("spatial_grid_radius_pairs", SPATIAL_ORACLE)
def spatial_grid_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer-point pairs within {r} units in the derived 16-bit
    integer plane: (key_a, key_b, dist_sq), key_a < key_b — via the 3×3
    neighbor-cell equi-join.""".format(r=_RADIUS)
    pts = _points(spark, sf_dir)
    probe = pts.select(
        F.col("key").alias("key_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.sequence(F.col("cx") - 1, F.col("cx") + 1)
        ).alias("jx"),
        "cy",
    ).select(
        "key_a",
        "xa",
        "ya",
        "jx",
        F.explode(F.sequence(F.col("cy") - 1, F.col("cy") + 1)).alias("jy"),
    )
    base = pts.select(
        F.col("key").alias("key_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(base, ["jx", "jy"])
        .where(F.col("key_a") < F.col("key_b"))
        .withColumn("dist_sq", dist_sq.cast("bigint"))
        .where(F.col("dist_sq") <= _RADIUS_SQ)
        .select("key_a", "key_b", "dist_sq")
    )


# ---------------------------------------------------------------------------
# Grid-blocked nearest neighbor (k=1 radius-bounded kNN)
# ---------------------------------------------------------------------------
#
# The "nearest store / nearest POI" shape: for every point, its closest
# OTHER point within _RADIUS, via the same 3x3 neighbor-cell equi-join
# as the pair query — candidates bounded by cell occupancy, never
# all-pairs. Radius-bounding is what keeps k-NN blockable at all: an
# unbounded nearest neighbor can live arbitrarily far away and needs a
# different structure (the ANN tiers in operators/similarity.py).
# Ties on equal dist_sq resolve to the lowest neighbor key; both
# engines compare exact integers, so the winner can't flip.

NN_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS key,
         CAST({md5_uniform16_sql(_MD5, 1)} AS BIGINT) AS x,
         CAST({md5_uniform16_sql(_MD5, 5)} AS BIGINT) AS y
  FROM customer
),
cand AS (
  SELECT a.key AS key, b.key AS nn_key,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq,
         ROW_NUMBER() OVER (
           PARTITION BY a.key
           ORDER BY (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y),
                    b.key
         ) AS rk
  FROM pts a JOIN pts b ON a.key <> b.key
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        <= {_RADIUS_SQ}
)
SELECT key, nn_key, CAST(dist_sq AS BIGINT) AS dist_sq
FROM cand WHERE rk = 1
"""


@register("spatial_nearest_neighbor", NN_ORACLE)
def spatial_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-bounded nearest neighbor per customer point:
    (key, nn_key, dist_sq) for every point with another point within
    {r} units; ties to the lowest neighbor key.""".format(r=_RADIUS)
    from pyspark.sql import Window

    pts = _points(spark, sf_dir)
    probe = pts.select(
        F.col("key").alias("key"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(F.sequence(F.col("cx") - 1, F.col("cx") + 1)).alias("jx"),
        "cy",
    ).select(
        "key",
        "xa",
        "ya",
        "jx",
        F.explode(F.sequence(F.col("cy") - 1, F.col("cy") + 1)).alias("jy"),
    )
    base = pts.select(
        F.col("key").alias("nn_key"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    cand = (
        probe.join(base, ["jx", "jy"])
        .where(F.col("key") != F.col("nn_key"))
        .withColumn("dist_sq", dist_sq.cast("bigint"))
        .where(F.col("dist_sq") <= _RADIUS_SQ)
    )
    w = Window.partitionBy("key").orderBy("dist_sq", "nn_key")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("key", "nn_key", "dist_sq")
    )


# ---------------------------------------------------------------------------
# DBSCAN density labels (core / border / noise)
# ---------------------------------------------------------------------------
#
# The density-clustering primitive (Ester et al. 1996) restricted to
# its exactly-SQL-expressible first phase: label every point core
# (≥ minPts points within eps, self included), border (non-core with a
# core neighbor), or noise. Cluster-id assignment is connected
# components over core points — that operator already exists
# (``operators/components.py``); this query drives the density math.
# eps is 4× the pair-query radius so the label mix is non-degenerate
# at the oracle SFs; the grid cell size equals eps, keeping the 3×3
# neighbor-cell equi-join argument intact (candidates bounded by cell
# occupancy, each neighbor pair produced exactly once per direction).
# All distances are exact integer dist² compares — no sqrt anywhere.

_DBSCAN_EPS = 2048
_DBSCAN_EPS_SQ = _DBSCAN_EPS * _DBSCAN_EPS
_DBSCAN_MINPTS = 4  # neighbors within eps INCLUDING the point itself

DBSCAN_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS key,
         CAST({md5_uniform16_sql(_MD5, 1)} AS BIGINT) AS x,
         CAST({md5_uniform16_sql(_MD5, 5)} AS BIGINT) AS y
  FROM customer
),
nbrs AS (
  SELECT a.key AS key, b.key AS nbr
  FROM pts a JOIN pts b ON a.key <> b.key
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        <= {_DBSCAN_EPS_SQ}
),
deg AS (SELECT key, COUNT(*)::BIGINT AS n FROM nbrs GROUP BY key),
core AS (
  SELECT p.key FROM pts p LEFT JOIN deg d ON p.key = d.key
  WHERE COALESCE(d.n, 0) + 1 >= {_DBSCAN_MINPTS}
),
border AS (
  SELECT DISTINCT n.key FROM nbrs n
  JOIN core c ON n.nbr = c.key
  WHERE n.key NOT IN (SELECT key FROM core)
),
labeled AS (
  SELECT p.key,
         CASE WHEN p.key IN (SELECT key FROM core) THEN 'core'
              WHEN p.key IN (SELECT key FROM border) THEN 'border'
              ELSE 'noise' END AS label
  FROM pts p
)
SELECT label, COUNT(*)::BIGINT AS n_points, SUM(key)::BIGINT AS key_sum
FROM labeled GROUP BY label
"""


@register("spatial_dbscan_labels", DBSCAN_ORACLE)
def spatial_dbscan_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density labels over the derived customer plane
    (eps={e}, minPts={m}): (label, n_points, key_sum).""".format(
        e=_DBSCAN_EPS, m=_DBSCAN_MINPTS
    )
    from tfm_semisup_spark.operators.lineage import truncate

    spark_md5 = "md5(CAST(c_custkey AS STRING))"
    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.expr(md5_uniform16_spark_sql(spark_md5, 1)).cast("bigint").alias("x"),
        F.expr(md5_uniform16_spark_sql(spark_md5, 5)).cast("bigint").alias("y"),
    ).withColumn("cx", (F.col("x") / _DBSCAN_EPS).cast("int")).withColumn(
        "cy", (F.col("y") / _DBSCAN_EPS).cast("int")
    )
    pts = truncate(pts, eager=True)  # feeds probe, base, and the label join
    probe = pts.select(
        F.col("key").alias("key_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(F.sequence(F.col("cx") - 1, F.col("cx") + 1)).alias("jx"),
        "cy",
    ).select(
        "key_a",
        "xa",
        "ya",
        "jx",
        F.explode(F.sequence(F.col("cy") - 1, F.col("cy") + 1)).alias("jy"),
    )
    base = pts.select(
        F.col("key").alias("key_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    nbrs = (
        probe.join(base, ["jx", "jy"])
        .where(F.col("key_a") != F.col("key_b"))
        .where(dist_sq <= _DBSCAN_EPS_SQ)
        .select(F.col("key_a").alias("key"), F.col("key_b").alias("nbr"))
    )
    nbrs = truncate(nbrs, eager=True)  # consumed by deg AND border
    deg = nbrs.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    core = (
        pts.join(deg, "key", "left")
        .where(F.coalesce(F.col("n"), F.lit(0)) + 1 >= _DBSCAN_MINPTS)
        .select("key")
    )
    border = (
        nbrs.join(core.withColumnRenamed("key", "nbr"), "nbr", "left_semi")
        .select("key")
        .distinct()
        .join(core, "key", "left_anti")
    )
    labeled = (
        pts.select("key")
        .join(core.withColumn("is_core", F.lit(1)), "key", "left")
        .join(border.withColumn("is_border", F.lit(1)), "key", "left")
        .select(
            "key",
            F.when(F.col("is_core") == 1, "core")
            .when(F.col("is_border") == 1, "border")
            .otherwise("noise")
            .alias("label"),
        )
    )
    return labeled.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("key").cast("bigint").alias("key_sum"),
    )

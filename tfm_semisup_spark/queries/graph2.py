"""Graph analytics #2: k-core peeling over the co-engagement graph.

Completes the graph family (connected components, PageRank, triangle
counts, label propagation) with the density-decomposition staple:
``item_kcore_membership`` runs a FIXED number of synchronous 2-core
peeling rounds (drop nodes with degree < 2, drop edges touching a
dropped node, repeat) and reports the surviving items with their
residual degree. Fixed rounds — not run-to-convergence — keep the
operator exactly SQL-expressible, so the DuckDB oracle is the same
peeling unrolled as a CTE chain (the PageRank/label-propagation
discipline).

Spark-first / 100 TB shape:
- the edge list (the capped co-visitation pairs of
  ``analytics._cooc_pairs``, support >= _KCORE_MIN_USERS — the same
  derivation the triangle query uses) is localCheckpoint-materialized
  ONCE; every round reuses its blocks;
- each peel round is one hash aggregate over the 2x edge incidence
  (degree), then two semi-joins keyed by endpoint to drop edges —
  shuffles scale with |edges|, never events;
- rounds are bounded (_KCORE_ROUNDS), so lineage is O(1) and the plan
  shape is fixed at any data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.operators.lineage import release, truncate
from tfm_semisup_spark.queries import register
from tfm_semisup_spark.queries.analytics import COOC_CAP, _cooc_pairs

_KCORE_K = 2
_KCORE_MIN_USERS = 2
_KCORE_ROUNDS = 3

# Shared edge derivation (identical to the triangle query's CTEs).
_EDGES_SQL = f"""
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
e0 AS (
  SELECT item_a, item_b FROM pairs WHERE n_users >= {_KCORE_MIN_USERS}
)"""


def _peel_round_sql(i: int) -> str:
    """One unrolled peel round: degrees of e{i-1}, keep >= k, filter."""
    return f"""
d{i} AS (
  SELECT item, COUNT(*) AS deg FROM (
    SELECT item_a AS item FROM e{i - 1}
    UNION ALL SELECT item_b FROM e{i - 1}
  ) GROUP BY item
),
k{i} AS (SELECT item FROM d{i} WHERE deg >= {_KCORE_K}),
e{i} AS (
  SELECT item_a, item_b FROM e{i - 1}
  WHERE item_a IN (SELECT item FROM k{i})
    AND item_b IN (SELECT item FROM k{i})
)"""


KCORE_ORACLE = (
    "WITH "
    + _EDGES_SQL
    + ","
    + ",".join(_peel_round_sql(i) for i in range(1, _KCORE_ROUNDS + 1))
    + f"""
SELECT item, CAST(COUNT(*) AS BIGINT) AS degree FROM (
  SELECT item_a AS item FROM e{_KCORE_ROUNDS}
  UNION ALL SELECT item_b FROM e{_KCORE_ROUNDS}
) GROUP BY item
"""
)


@register("item_kcore_membership", KCORE_ORACLE)
def item_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-core peeling, {r} synchronous rounds, over the thresholded
    co-engagement graph: (item, degree) for every item still incident
    to an edge after round {r} — ``degree`` is the residual-graph
    degree.""".format(k=_KCORE_K, r=_KCORE_ROUNDS)
    edges = truncate(
        _cooc_pairs(spark, sf_dir)
        .where(F.col("n_users") >= _KCORE_MIN_USERS)
        .select("item_a", "item_b")
    )
    for _ in range(_KCORE_ROUNDS):
        incidence = edges.select(F.col("item_a").alias("item")).unionAll(
            edges.select(F.col("item_b").alias("item"))
        )
        keep = (
            incidence.groupBy("item")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= _KCORE_K)
            .select("item")
        )
        nxt = truncate(
            edges.join(
                keep, edges.item_a == keep.item, "left_semi"
            ).join(keep, F.col("item_b") == keep.item, "left_semi")
        )
        release(edges)
        edges = nxt
    out = (
        edges.select(F.col("item_a").alias("item"))
        .unionAll(edges.select(F.col("item_b").alias("item")))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return out

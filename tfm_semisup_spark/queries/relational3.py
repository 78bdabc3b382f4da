"""Third relational coverage block: semi/anti joins, pivot, exact
percentiles, planted-duplicate dedup, full-corpus embedding similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.functions.vector import cosine_paired, l2_norm_fixed
from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

# LEFT SEMI join (EXISTS): customers that have at least one urgent order.
SEMI_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
"""


@register("semi_join_urgent_customers", SEMI_ORACLE)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# LEFT ANTI join (NOT EXISTS): customers with no orders at all.
ANTI_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
GROUP BY c_mktsegment
"""


@register("anti_join_orderless_customers", ANTI_ORACLE)
def anti_join_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Nonzero-membership anti-join variant (VERDICT r11 #5): the plain
# orderless-customers anti join is legitimately EMPTY on the synthetic
# data (every customer has orders), so its driver row passed without
# exercising membership. Restricting the right side to URGENT orders
# gives genuine anti-join members (customers who never placed an
# urgent order) at every SF — the NOT-EXISTS logic is now data-driven.
ANTI_NONZERO_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
"""


@register("anti_join_no_urgent_customers", ANTI_NONZERO_ORACLE)
def anti_join_no_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# PIVOT: order counts per status (rows) x priority (columns). Spark
# .pivot with explicit values (no extra distinct-scan job); oracle uses
# conditional aggregation — identical semantics, portable SQL.
PIVOT_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
FROM orders
GROUP BY o_orderstatus
"""


@register("pivot_status_by_priority", PIVOT_ORACLE)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "5-LOW"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderstatus",
            F.coalesce(F.col("1-URGENT"), F.lit(0)).alias("urgent"),
            F.coalesce(F.col("2-HIGH"), F.lit(0)).alias("high"),
            F.coalesce(F.col("5-LOW"), F.lit(0)).alias("low"),
        )
    )


# Exact percentiles (linear interpolation — Spark `percentile` and
# DuckDB `quantile_cont` share the definition).
PERCENTILE_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
FROM lineitem
GROUP BY l_returnflag
"""


@register("percentiles_extendedprice", PERCENTILE_ORACLE)
def percentiles_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
    )


# Dedup with PLANTED duplicates: the corpus is dup-free, so union a
# copy under shifted ids — the keeper query must then select exactly
# the original min-id per text. Proves the dedup operator actually
# drops rows (the plain-corpus variant can't distinguish a no-op).
# The shift is DERIVED (max(doc_id)+1, exact BIGINT on both engines)
# so planted ids never collide with originals at any corpus size — a
# fixed 1e6 shift would silently collide once a generated probe
# corpus reaches 1e6 doc_ids (r14 review; same fix as
# dedup_exact_keepers).
PLANTED_ORACLE = """
WITH shift AS (SELECT MAX(doc_id) + 1 AS s FROM documents),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT s FROM shift) AS doc_id, text FROM documents
)
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_unique,
       CAST(SUM(CASE WHEN doc_id < (SELECT s FROM shift) THEN 0 ELSE 1 END) AS BIGINT) AS n_planted,
       (SELECT COUNT(*) FROM (
          SELECT md5(text), MIN(doc_id) AS keeper FROM corpus GROUP BY 1
        ) WHERE keeper < (SELECT s FROM shift)) AS n_keepers_original
FROM corpus
"""


@register("dedup_planted_duplicates", PLANTED_ORACLE)
def dedup_planted_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shift = docs.agg(F.max("doc_id")).first()[0] + 1
    corpus = docs.unionAll(
        docs.select((F.col("doc_id") + F.lit(shift)).alias("doc_id"), "text")
    )
    keepers = corpus.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("keeper")
    )
    n_keepers_original = keepers.where(F.col("keeper") < shift).count()
    return corpus.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.sum(F.when(F.col("doc_id") < shift, 0).otherwise(1))
        .cast("long")
        .alias("n_planted"),
        F.lit(n_keepers_original).cast("long").alias("n_keepers_original"),
    )


# Full-corpus embedding cosine near-dup pairs (exact, oracled — the
# brute-force tier under the LSH scale path). Threshold keeps output
# small; at 100 TB this moves to LSH candidates first.
COSINE_PAIRS_ORACLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_inner_product(a.e, b.e)
         / (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))),
         4) AS cosine_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_inner_product(a.e, b.e)
        / (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) > 0.35
"""


@register("dedup_embedding_cosine_pairs", COSINE_PAIRS_ORACLE)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # fixed-arity dot: this nested-loop tier evaluates the dot product
    # O(N^2) times — the interpreted HOF form is the wrong shape here
    # (functions/vector.py); dim from a driver-side pyarrow peek
    # (io.embedding_dim) — no per-call Spark probe job. Norms are
    # projected per side BEFORE the join so the join-fused method
    # holds only the dot (the full cosine composite fused there blows
    # the 64 KB codegen limit; vector.cosine_paired rationale).
    from tfm_semisup_spark.io import embedding_dim

    dim = embedding_dim(sf_dir)
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"),
        l2_norm_fixed("e", dim).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"),
        l2_norm_fixed("e", dim).alias("nb"),
    )
    sim = cosine_paired("ea", "eb", "na", "nb", dim)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .where(sim > 0.35)
        .select("vec_a", "vec_b", F.round(sim, 4).alias("cosine_sim"))
    )


# SQL API surface (SURVEY §2.2 catalog note): same query text runs via
# spark.sql over temp views AND via DuckDB — one statement, two engines.
SQL_API_TEXT = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY c_mktsegment
"""


@register("sql_api_segment_revenue", SQL_API_TEXT)
def sql_api_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tfm_semisup_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_API_TEXT)


# Incremental (cross-snapshot) dedup: which new-snapshot docs are
# content-new vs already present in the old snapshot — fingerprint
# anti-join, the shape of a daily ingest dedup step.
INCREMENTAL_ORACLE = """
WITH old AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
     new AS (SELECT * FROM documents WHERE doc_id % 2 = 1)
SELECT COUNT(*) AS n_new_docs,
       CAST(SUM(CASE WHEN NOT EXISTS (
         SELECT 1 FROM old WHERE md5(old.text) = md5(new.text)
       ) THEN 1 ELSE 0 END) AS BIGINT) AS n_content_new
FROM new
"""


@register("dedup_incremental_new_docs", INCREMENTAL_ORACLE)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0).select(F.md5("text").alias("fp"))
    new = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", F.md5("text").alias("fp"))
    content_new = new.join(old, "fp", "left_anti")
    n_content_new = content_new.count()
    return new.agg(
        F.count(F.lit(1)).alias("n_new_docs"),
        F.lit(n_content_new).cast("long").alias("n_content_new"),
    )


# Grouped applyInPandas custom aggregation vs SQL's closed form: per-user
# OLS slope of event value over time (regr_slope). Two genuinely
# independent implementations (numpy least squares / SQL normal
# equations) — strong cross-check of the Arrow grouped-UDF path.
TREND_ORACLE = """
SELECT user_id,
       COUNT(*) AS n,
       ROUND(regr_slope(value,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) / 3.6e9), 4) AS slope
FROM events
GROUP BY user_id
"""


@register("grouped_pandas_value_trend", TREND_ORACLE)
def grouped_pandas_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tfm_semisup_spark.operators.grouped_pandas import per_user_value_trend

    events = load_table(spark, sf_dir, "events")
    out = per_user_value_trend(events)
    return out.select("user_id", "n", F.round("slope", 4).alias("slope"))

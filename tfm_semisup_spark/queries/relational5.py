"""Fifth relational coverage block: date/interval arithmetic, array
functions, posexplode, null-safe equality."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

# date_trunc / datediff / date_add / last_day
DATE_ARITH_ORACLE = """
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', date_trunc('month', o_orderdate), o_orderdate) AS BIGINT)
         AS day_in_month,
       strftime(o_orderdate + INTERVAL '30 days', '%Y-%m-%d') AS due_date,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
FROM orders
"""


@register("date_arithmetic", DATE_ARITH_ORACLE)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(
            F.col("o_orderdate"), F.date_trunc("month", "o_orderdate")
        ).cast("long").alias("day_in_month"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


# Array function battery over tokenized text: sort/contains/slice/size.
ARRAY_FUNCS_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(list_contains(w, 'spark') AS BOOLEAN) AS has_spark,
       array_to_string(list_sort(w[1:5]), ' ') AS first5_sorted,
       w[2] AS second_token
FROM toks
WHERE len(w) >= 5
"""


@register("array_function_battery", ARRAY_FUNCS_ORACLE)
def array_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.withColumn("w", F.filter(F.split("text", " "), lambda t: t != ""))
    return toks.where(F.size("w") >= 5).select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.array_contains("w", "spark").alias("has_spark"),
        # array outputs are stringified on both sides: list-vs-ndarray
        # representations hash differently in pandas-based compares
        F.concat_ws(" ", F.sort_array(F.slice("w", 1, 5))).alias("first5_sorted"),
        F.element_at("w", 2).alias("second_token"),
    )


# posexplode / unnest WITH ORDINALITY
POSEXPLODE_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents WHERE doc_id < 10
)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS token
FROM toks, UNNEST(generate_series(1, len(w))) AS t(i)
"""


@register("posexplode_tokens", POSEXPLODE_ORACLE)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 10)
    toks = docs.withColumn("w", F.filter(F.split("text", " "), lambda t: t != ""))
    return toks.select(
        "doc_id", F.posexplode("w").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


# Null-safe equality (<=> / IS NOT DISTINCT FROM) over manufactured nulls.
NULL_SAFE_ORACLE = """
WITH x AS (
  SELECT c_custkey,
         NULLIF(c_mktsegment, 'MACHINERY') AS a,
         NULLIF(c_mktsegment, 'BUILDING') AS b
  FROM customer
)
SELECT (a IS NOT DISTINCT FROM b) AS same, COUNT(*) AS n
FROM x
GROUP BY 1
"""


@register("null_safe_equality", NULL_SAFE_ORACLE)
def null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    x = cust.select(
        F.nullif("c_mktsegment", F.lit("MACHINERY")).alias("a"),
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("b"),
    )
    return x.groupBy(F.col("a").eqNullSafe(F.col("b")).alias("same")).agg(
        F.count(F.lit(1)).alias("n")
    )

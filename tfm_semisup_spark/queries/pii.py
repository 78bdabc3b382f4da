"""PII governance queries (extension surface).

The synthetic corpus carries no real PII, so the query PLANTS
deterministic PII (derived from doc_id, same expression on both
engines) into a slice of documents, then detects and redacts it with
the shared patterns from operators/pii.py — the same
plant-then-measure pattern as ``dedup_planted_duplicates``. The
compare therefore exercises the full detect+redact chain, not just
zero counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.pii import pii_counts, redact
from tfm_semisup_spark.queries import register

# every 7th doc gets one email + one IPv4 + one phone appended.
# Dialect-portable subset only (runs verbatim under Spark SQL and
# DuckDB): CAST AS STRING (DuckDB aliases STRING->VARCHAR), no ::.
_PLANT_SQL = """
CASE WHEN doc_id % 7 = 0 THEN
  text || ' contact u' || CAST(doc_id AS STRING) || '@mail.com at 10.0.0.'
       || CAST(doc_id % 250 AS STRING) || ' or 555-'
       || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
ELSE text END
"""

PII_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, source, {_PLANT_SQL} AS text FROM documents
),
scanned AS (
  SELECT source,
         len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}')) AS n_email,
         len(regexp_extract_all(text, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS n_ipv4,
         len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{4}}\\b')) AS n_phone,
         length(text) - length(
           regexp_replace(regexp_replace(regexp_replace(text,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}', '<EMAIL>', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IPV4>', 'g'),
             '\\b\\d{{3}}-\\d{{4}}\\b', '<PHONE>', 'g')
         ) AS delta
  FROM planted
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(CASE WHEN n_email + n_ipv4 + n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       SUM(n_email)::BIGINT AS total_emails,
       SUM(n_ipv4)::BIGINT AS total_ipv4,
       SUM(n_phone)::BIGINT AS total_phones,
       SUM(delta)::BIGINT AS chars_removed
FROM scanned
GROUP BY source
ORDER BY source
"""


@register("pii_redaction_report", PII_ORACLE)
def pii_redaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII census + redaction size delta. One narrow
    projection (codegen'd regex) + one partial-aggregated groupBy on
    the low-cardinality source key — scan-bound at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select("doc_id", "source", F.expr(_PLANT_SQL).alias("text"))
    counts = pii_counts("text")
    scanned = planted.select(
        "source",
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
        (F.length("text") - F.length(redact("text"))).alias("delta"),
    )
    return (
        scanned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.col("n_email") + F.col("n_ipv4") + F.col("n_phone") > 0, 1
                ).otherwise(0)
            ).alias("docs_with_pii"),
            F.sum("n_email").alias("total_emails"),
            F.sum("n_ipv4").alias("total_ipv4"),
            F.sum("n_phone").alias("total_phones"),
            F.sum("delta").cast("bigint").alias("chars_removed"),
        )
        .orderBy("source")
    )

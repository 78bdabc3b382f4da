"""Boilerplate line removal queries (extension surface).

The synthetic corpus is independent word soup — no line repeats across
documents naturally — so, exactly like the contamination screen, the
query PLANTS the signal first: every ``doc_id % 3 = 0`` document gets a
fixed 10-word footer PREPENDED (prepending keeps every original word
window aligned; an appended footer would merge with the final partial
window of each document and fragment differently per doc). The footer
then occurs in ~1/3 of all documents, far past ``MIN_DOCS``, and the
removal must strip exactly that one line from exactly the planted
documents — verified per-document against the DuckDB oracle via an
md5 fingerprint of the re-assembled text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.boilerplate import remove_boilerplate_lines
from tfm_semisup_spark.queries import register

LINE_TOKENS = 10
MIN_DOCS = 30
FOOTER = "subscribe now to our free newsletter for the latest updates"

BOILERPLATE_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 3 = 0 THEN '{FOOTER} ' || text ELSE text END AS text
  FROM documents
),
toks AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM planted
),
segs AS (
  SELECT doc_id, source, s AS pos,
         array_to_string(list_slice(w, s, s + {LINE_TOKENS - 1}), ' ') AS line
  FROM toks, UNNEST(generate_series(1, len(w), {LINE_TOKENS})) AS t(s)
  WHERE len(w) >= 1
),
freq AS (
  SELECT line, COUNT(DISTINCT doc_id) AS n_docs
  FROM segs GROUP BY line HAVING COUNT(DISTINCT doc_id) >= {MIN_DOCS}
),
marked AS (
  SELECT s.doc_id, s.pos, s.line, (f.line IS NOT NULL) AS bp
  FROM segs s LEFT JOIN freq f ON s.line = f.line
),
agg AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_segments,
         SUM(CASE WHEN bp THEN 1 ELSE 0 END)::BIGINT AS n_boilerplate,
         md5(COALESCE(string_agg(CASE WHEN NOT bp THEN line END, ' ' ORDER BY pos), ''))
           AS clean_fp
  FROM marked
  GROUP BY doc_id
)
SELECT p.doc_id, p.source,
       COALESCE(a.n_segments, 0)::BIGINT AS n_segments,
       COALESCE(a.n_boilerplate, 0)::BIGINT AS n_boilerplate,
       COALESCE(a.clean_fp, md5('')) AS clean_fp
FROM planted p LEFT JOIN agg a ON p.doc_id = a.doc_id
ORDER BY p.doc_id
"""


@register("boilerplate_line_removal", BOILERPLATE_ORACLE)
def boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate removal summary over the planted
    corpus: (doc_id, source, n_segments, n_boilerplate, clean_fp).
    Plan: narrow segment explode -> 8-byte-key frequency agg (map-side
    combine) -> AQE-broadcast mark join -> one reassembly shuffle."""
    # single-file parquet arrives as ONE split — spread the segment
    # explode (the scan-side cost) across the cluster
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    planted = docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat_ws(" ", F.lit(FOOTER), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    cleaned = remove_boilerplate_lines(
        planted, line_tokens=LINE_TOKENS, min_docs=MIN_DOCS
    )
    return cleaned.select(
        "doc_id",
        "source",
        "n_segments",
        "n_boilerplate",
        F.md5("clean_text").alias("clean_fp"),
    ).orderBy("doc_id")

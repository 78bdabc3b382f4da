"""Benchmark decontamination screen (extension surface).

Before training, a corpus is screened against held-out evaluation
benchmarks: any training document sharing long n-grams with a
benchmark item is flagged (public practice: GPT-3 appendix C 13-gram
overlap; Dolma / FineWeb decontamination passes). Semantics here:

- benchmark set = documents with ``doc_id % 97 = 0`` (a deterministic
  ~1% slice standing in for an external benchmark table);
- the query PLANTS leakage first (every 37th doc gets benchmark doc
  0's text appended, identically on both engines — the synthetic
  corpus has no natural 8-gram overlap at sf0.01, and a screen
  verified only on empty output proves nothing);
- a corpus doc is CONTAMINATED when it shares >= 1 distinct word
  8-gram with any benchmark doc (8-grams: long enough that chance
  overlap in the synthetic corpus is nil — matches signal leakage,
  not shared stop-phrases).

Physical shape for 100 TB: benchmarks are tiny (MMLU+GSM8K+... is
megabytes); the benchmark 8-gram set builds once, and the corpus scan
probes it with a BROADCAST left-semi join on 8-byte xxhash64 values —
no shuffle of the corpus, scan-bound. The oracle proves the same
semantics relationally (string n-grams, no hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register
from tfm_semisup_spark.queries.dedup import hashed_shingles

CONTAMINATION_ORACLE = """
WITH planted AS (
  SELECT d.doc_id, d.source,
         CASE WHEN d.doc_id % 37 = 5 AND d.doc_id % 97 <> 0
              THEN d.text || ' ' || b.bench_text ELSE d.text END AS text
  FROM documents d
  CROSS JOIN (SELECT text AS bench_text FROM documents WHERE doc_id = 0) b
),
toks AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM planted
),
grams AS (
  SELECT DISTINCT doc_id, source,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
         w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS gram
  FROM toks, UNNEST(generate_series(1, len(w) - 7)) AS t(i)
  WHERE len(w) >= 8
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
flagged AS (
  SELECT DISTINCT g.doc_id, g.source
  FROM grams g JOIN bench b ON g.gram = b.gram
  WHERE g.doc_id % 97 <> 0
)
SELECT source,
       COUNT(*)::BIGINT AS n_contaminated,
       MIN(doc_id) AS first_doc_id
FROM flagged
GROUP BY source
ORDER BY source
"""


@register("contamination_screen", CONTAMINATION_ORACLE)
def contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source count of corpus docs sharing an 8-gram with the
    benchmark slice. Plan: benchmark gram set (tiny) -> broadcast ->
    left-semi probe from the corpus gram scan -> partial-agg groupBy."""
    # single-file parquet arrives as ONE split — without this the
    # whole 8-gram shingling (the query's dominant cost) runs in one
    # task (same gotcha as the jaccard/editdist tiers)
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    bench0 = F.broadcast(
        docs.where(F.col("doc_id") == 0).select(F.col("text").alias("bench_text"))
    )
    planted = docs.crossJoin(bench0).select(
        "doc_id",
        "source",
        F.when(
            (F.col("doc_id") % 37 == 5) & (F.col("doc_id") % 97 != 0),
            F.concat_ws(" ", "text", "bench_text"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # hashed-shingle index (longs, primitive distinct — see
    # hashed_shingles); persisted because both the benchmark branch
    # and the corpus probe read it
    grams = (
        hashed_shingles(planted, 8)
        .select("doc_id", F.explode("hs").alias("gram"))
        .persist()
    )
    is_bench = F.col("doc_id") % 97 == 0
    bench = grams.where(is_bench).select("gram").distinct()
    hits = (
        grams.where(~is_bench)
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    sources = docs.select("doc_id", "source")
    out = (
        hits.join(sources, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_contaminated"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("source")
    )
    # tiny report: materialize it, then release the gram index so
    # library callers in long-lived sessions don't leak cached blocks
    # (same discipline as substring_cut_spans)
    from tfm_semisup_spark.operators.lineage import truncate

    out = truncate(out)
    grams.unpersist()
    return out

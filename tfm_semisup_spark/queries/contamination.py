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


# ---------------------------------------------------------------------------
# Bloom-filter membership tier
# ---------------------------------------------------------------------------
#
# The exact screen above broadcasts the DISTINCT benchmark gram set
# (8-byte hashes). At 100 TB the benchmark side stays small, but the
# classic constant-memory alternative is a BLOOM FILTER: an m-bit
# bitset with k hash positions per gram — fixed 8 KiB here (m = 65536,
# k = 2) no matter how many grams go in, probed by a pure codegen bit
# test on the corpus scan (no join at all on the probe side; candidate
# docs then verify against the exact gram set, which also measures the
# filter's realized false-positive rate).
#
# Portability makes it oracle-able: both bit positions are 4-hex-char
# slices of ONE md5(gram) digest through the shared uniform decode
# (operators/layout.py::md5_uniform16_sql at start=1 and start=5) —
# bit-identical in Spark and DuckDB, so both engines agree on every
# bloom-positive doc, INCLUDING the false positives.
#
# Perf shape (first cut measured 30.8s at sf0.1 — 12x the exact
# screen): the gram STRING must exist to md5 it (the portability
# price), but it must be hashed ONCE. The corpus gram scan computes
# (xxhash64(gram), p0, p1) in a single projection and persists ONLY
# those three longs/ints — every downstream stage (bitset build, bit
# probe, exact verify join) then touches primitive columns, never the
# strings again. One digest, two position slices (not two salted
# digests); the verify join runs on the 8-byte hashes like the exact
# screen (same astronomically-unlikely-collision trade as
# hashed_shingles).

BLOOM_M = 65536  # bits (8 KiB) -> positions are exactly the uniform16 decode
BLOOM_WORDS = BLOOM_M // 64

from tfm_semisup_spark.operators.layout import (  # noqa: E402
    md5_uniform16_spark_sql,
    md5_uniform16_sql,
)

# position j (j = 0, 1) of column ``gram``: hex chars 1-4 / 5-8 of one digest
_BLOOM_POS = [md5_uniform16_sql("md5(gram)", start=1 + 4 * j) for j in (0, 1)]
# Spark-side: value-identical single-reference conv decode
_BLOOM_POS_SPARK = [
    md5_uniform16_spark_sql("md5(gram)", start=1 + 4 * j) for j in (0, 1)
]

BLOOM_ORACLE = f"""
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
  SELECT doc_id, source,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
         w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS gram
  FROM toks, UNNEST(generate_series(1, len(w) - 7)) AS t(i)
  WHERE len(w) >= 8
),
hashed AS (
  SELECT doc_id, source, gram,
         {_BLOOM_POS[0]} AS p0, {_BLOOM_POS[1]} AS p1
  FROM grams
),
bpos AS (
  SELECT DISTINCT pos FROM (
    SELECT p0 AS pos FROM hashed WHERE doc_id % 97 = 0
    UNION ALL
    SELECT p1 AS pos FROM hashed WHERE doc_id % 97 = 0
  )
),
positive AS (
  SELECT DISTINCT doc_id, source FROM hashed
  WHERE doc_id % 97 <> 0
    AND p0 IN (SELECT pos FROM bpos)
    AND p1 IN (SELECT pos FROM bpos)
),
verified AS (
  SELECT DISTINCT c.doc_id
  FROM hashed c
  JOIN (SELECT DISTINCT gram FROM hashed WHERE doc_id % 97 = 0) b
    ON c.gram = b.gram
  WHERE c.doc_id % 97 <> 0
)
SELECT p.source,
       COUNT(*)::BIGINT AS n_candidate,
       SUM(CASE WHEN v.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_verified
FROM positive p LEFT JOIN verified v ON p.doc_id = v.doc_id
GROUP BY p.source
ORDER BY p.source
"""


@register("bloom_contamination_screen", BLOOM_ORACLE)
def bloom_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (n_candidate, n_verified) of the bloom screen: docs
    whose 8-grams hit both bloom bits built from the benchmark slice,
    and how many of those share a REAL benchmark gram. Plan: one
    string-hashing projection persisted as (gram_h, p0, p1) primitives
    -> tiny bitset aggregate (<= 1024 rows) -> driver -> literal-array
    codegen bit test on int columns -> hash-key verify join."""
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
    words = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    gram_arr = F.transform(
        F.sequence(F.lit(1), F.size("__w") - 7),
        lambda s: F.array_join(F.slice(F.col("__w"), s, 8), " "),
    )
    # the ONLY pass that touches gram strings: hash them all at once
    hashed = (
        planted.withColumn("__w", words)
        .where(F.size("__w") >= 8)
        .select("doc_id", "source", F.explode(gram_arr).alias("gram"))
        .select(
            "doc_id",
            "source",
            F.xxhash64("gram").alias("gram_h"),
            F.expr(_BLOOM_POS_SPARK[0]).alias("p0"),
            F.expr(_BLOOM_POS_SPARK[1]).alias("p1"),
        )
        .persist()
    )
    is_bench = F.col("doc_id") % 97 == 0
    bench = hashed.where(is_bench)
    # build the bitset: positions -> 64-bit words via bit_or, <= 1024
    # tiny rows collected (bounded by construction, not by data)
    pos = (
        bench.select(F.col("p0").alias("pos"))
        .union(bench.select(F.col("p1").alias("pos")))
        .distinct()
    )
    word_rows = (
        pos.groupBy(F.expr("CAST(pos DIV 64 AS INT)").alias("widx"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))"
            ).alias("bits")
        )
        .collect()
    )
    bloom = [0] * BLOOM_WORDS
    for r in word_rows:
        bloom[r["widx"]] = r["bits"]
    # ONE SQL string for the probe (single parse — plan-construction
    # lesson in SCALE.md); the 8 KiB bitset rides along as an array
    # literal, so the probe is scan + codegen over two int columns
    arr = "array(" + ",".join(f"CAST({w} AS BIGINT)" for w in bloom) + ")"

    def bit_test(col: str) -> str:
        return (
            f"(element_at({arr}, CAST({col} DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({col} % 64 AS INT))) <> 0"
        )

    corpus = hashed.where(~is_bench)
    positive = (
        corpus.where(F.expr(f"{bit_test('p0')} AND {bit_test('p1')}"))
        .select("doc_id", "source")
        .distinct()
    )
    verified = (
        corpus.join(
            F.broadcast(bench.select("gram_h").distinct()), "gram_h", "left_semi"
        )
        .select("doc_id")
        .distinct()
        .withColumn("__v", F.lit(1))
    )
    out = (
        positive.join(verified, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_candidate"),
            F.sum(F.when(F.col("__v").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_verified"),
        )
        .orderBy("source")
    )
    from tfm_semisup_spark.operators.lineage import truncate

    out = truncate(out)
    hashed.unpersist()
    return out


# ---------------------------------------------------------------------------
# Semantic (embedding-space) contamination screen
# ---------------------------------------------------------------------------
#
# The lexical screens above miss paraphrased benchmark leakage; modern
# decontamination passes (e.g. embedding-similarity screens in public
# LLM data pipelines) therefore ALSO flag training items whose
# embedding sits too close to a benchmark embedding. Semantics:
# benchmark set = vec_id % 19 == 0; a training vector is contaminated
# when cosine >= _SEM_TAU against ANY benchmark vector; report
# (vec_id, n_hits, max_cos).
#
# ORACLE TIER — the screened training side is a fixed vec_id % 7 == 1
# subset so the exact all-pairs probe stays bounded (the
# similarity_pairs_above discipline). The full-corpus path is the
# LSH-bucketed candidate generator (operators/dedup.py
# embedding_near_dup_pairs) feeding this same exact verify.
#
# 100 TB shape: benchmarks are bounded (eval suites are megabytes), so
# the probe is corpus-scan x BROADCAST benchmark — zero corpus
# shuffle, then one hash aggregate keyed by the (already filtered)
# contaminated vec_ids. Both engines cast float32 -> double before the
# dot products; the final stats are rounded.

_SEM_TAU = 0.2

SEMANTIC_CONTAM_ORACLE = f"""
WITH bench AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 19 = 0
),
train AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 19 <> 0 AND vec_id % 7 = 1
),
sims AS (
  SELECT t.vec_id,
         list_inner_product(t.v, b.v)
           / (sqrt(list_inner_product(t.v, t.v))
              * sqrt(list_inner_product(b.v, b.v))) AS sim
  FROM train t, bench b
)
SELECT vec_id,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       ROUND(MAX(sim), 4) AS max_cos
FROM sims
WHERE sim > {_SEM_TAU}
GROUP BY vec_id
"""


@register("semantic_contamination_screen", SEMANTIC_CONTAM_ORACLE)
def semantic_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: training vectors (fixed %7
    subset) with cosine > {tau} to any benchmark vector (%19 slice):
    (vec_id, n_hits, max_cos).""".format(tau=_SEM_TAU)
    from tfm_semisup_spark.functions.vector import cosine_paired, l2_norm_fixed
    from tfm_semisup_spark.io import embedding_dim

    emb = load_table(spark, sf_dir, "embeddings")
    dim = embedding_dim(sf_dir)
    # Per-side norm projections BEFORE the cross join: the bench norms
    # are computed once at broadcast build, the train norms once per
    # corpus row, and the method fused with join+filter holds only the
    # dot — the full cosine composite fused there overflows the 64 KB
    # codegen limit and runs interpreted (vector.cosine_paired).
    bench = emb.where(F.col("vec_id") % 19 == 0).select(
        F.col("embedding").cast("array<double>").alias("bv")
    )
    bench = bench.select("bv", l2_norm_fixed("bv", dim).alias("nb"))
    train = emb.where(
        (F.col("vec_id") % 19 != 0) & (F.col("vec_id") % 7 == 1)
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("tv"))
    train = train.select("vec_id", "tv", l2_norm_fixed("tv", dim).alias("nt"))
    sim = cosine_paired("tv", "bv", "nt", "nb", dim)
    # The tau gate lives INSIDE the aggregation (HAVING n_hits > 0),
    # not in a Filter: a `.where(sim > tau)` gets pushed into the join
    # condition AND re-inlined by the aliased-column substitution, so
    # the dot evaluates twice per pair and the join-fused method (dot
    # x2 + partial agg) overflows 64 KB anyway. This shape projects
    # `sim` exactly once; CollapseProject won't inline a non-cheap
    # alias referenced by multiple agg expressions, so the dot stays
    # single. `when` leaves non-passing pairs NULL, which sum/max
    # skip — bit-equal to filter-then-aggregate.
    passing = F.when(F.col("sim") > _SEM_TAU, F.col("sim"))
    return (
        train.crossJoin(F.broadcast(bench))
        .select("vec_id", sim.alias("sim"))
        .groupBy("vec_id")
        .agg(
            F.sum(F.when(F.col("sim") > _SEM_TAU, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hits"),
            F.round(F.max(passing), 4).alias("max_cos"),
        )
        .where(F.col("n_hits") > 0)
    )

"""Text-analysis operators over the documents table (SURVEY.md §2.3).

Language-ID, quality scoring, and token counting as pure columnar
expressions — a 100 TB documents table never leaves the JVM. The
whitespace tokenizer is split-on-single-space + empty-filter so the
DuckDB oracle (``string_split``) computes the identical token set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.layout import md5_uniform16_sql
from tfm_semisup_spark.queries import register


def _tokens(text: Column | str = "text") -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


STATS_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 4) AS avg_chars,
       ROUND(AVG(len(list_filter(string_split(text, ' '), t -> t <> ''))), 4) AS avg_tokens,
       CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY lang
"""


@register("text_stats_by_lang", STATS_ORACLE)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens())
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg(n_tok), 4).alias("avg_tokens"),
            F.sum(n_tok).cast("long").alias("total_tokens"),
        )
    )


# Token counting, two tokenizers side by side (SURVEY §2.3 "whitespace +
# a BPE-ish regex"): whitespace tokens vs lowercase-word regex tokens.
TOKEN_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT)
         AS ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS re_tokens
FROM documents
GROUP BY source
"""


@register("token_count_by_source", TOKEN_ORACLE)
def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(_tokens())
    re_tok = F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), F.lit(0)))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(ws).cast("long").alias("ws_tokens"),
            F.sum(re_tok).cast("long").alias("re_tokens"),
        )
    )


# Quality scoring: stopword ratio + mean word length, bucketed histogram.
QUALITY_ORACLE = """
WITH scored AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) * 1.0
           / len(list_filter(string_split(text, ' '), t -> t <> '')) AS stop_ratio
  FROM documents
  WHERE len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
)
SELECT CAST(floor(stop_ratio * 20) AS BIGINT) AS stop_bucket,
       COUNT(*) AS n,
       ROUND(AVG(stop_ratio), 4) AS avg_stop_ratio
FROM scored
GROUP BY 1
"""


@register("quality_score_buckets", QUALITY_ORACLE)
def quality_score_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    stop_ratio = (
        F.size(F.filter(F.split("text", " "), lambda t: (t == "the") | (t == "a"))) * 1.0
        / F.size(toks)
    )
    scored = docs.where(F.size(toks) > 0).select(stop_ratio.alias("stop_ratio"))
    return (
        scored.groupBy(F.floor(F.col("stop_ratio") * 20).cast("long").alias("stop_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
        )
    )


# Language-ID heuristic: marker-token votes. The corpus is synthetic word
# salad, so this checks the OPERATOR (deterministic votes per doc), not
# real linguistics — group by (actual lang, predicted) is a confusion
# matrix both engines can compute.
LANG_ID_ORACLE = """
WITH toks AS (
  SELECT lang, list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
),
pred AS (
  SELECT lang,
         CASE WHEN len(list_filter(w, t -> t IN ('the', 'a'))) * 2
                   >= len(list_filter(w, t -> t IN ('data', 'query'))) * 3
              THEN 'en' ELSE 'other' END AS predicted
  FROM toks
)
SELECT lang, predicted, COUNT(*) AS n
FROM pred
GROUP BY 1, 2
"""


@register("lang_id_confusion", LANG_ID_ORACLE)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = _tokens()
    en_votes = F.size(F.filter(w, lambda t: (t == "the") | (t == "a")))
    other_votes = F.size(F.filter(w, lambda t: (t == "data") | (t == "query")))
    predicted = F.when(en_votes * 2 >= other_votes * 3, "en").otherwise("other")
    return (
        docs.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Document fingerprinting: content hash + shape signature (length, token
# count) — the join key for cross-snapshot incremental dedup.
FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(text) AS content_fp,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
FROM documents
"""


@register("doc_fingerprints", FINGERPRINT_ORACLE)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_fp"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(_tokens()).cast("long").alias("n_tokens"),
    )


@register("text_tfidf_norms")
def text_tfidf_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark ML text featurization (RegexTokenizer -> StopWordsRemover ->
    HashingTF -> IDF); rows-only (hashing TF not DuckDB-expressible).
    Deterministic: HashingTF is stateless, IDF depends only on corpus."""
    from pyspark.ml.functions import vector_to_array

    from tfm_semisup_spark.operators.text_pipeline import build_text_pipeline

    docs = load_table(spark, sf_dir, "documents")
    model = build_text_pipeline().fit(docs)
    out = model.transform(docs)
    arr = vector_to_array(F.col("tfidf"))
    l2 = F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, v: a + v * v))
    return out.select("doc_id", F.round(l2, 4).alias("tfidf_l2"))


# ---------------------------------------------------------------------------
# Portable TF-IDF norms — the ORACLED sibling of text_tfidf_norms
# (r12 promotion, VERDICT r11 #7; the dedup_minhash_portable_pairs
# trade: the MLlib HashingTF/IDF tier above stays the production path,
# this tier oracle-checks the hashed-TF-IDF MATH cross-engine)
# ---------------------------------------------------------------------------
#
# Both engines derive the feature bucket from the SAME md5 digest
# (u16 % 512 — 65536 % 512 == 0, exactly uniform), and the IDF weight
# is the EXACT INTEGER quotient idf_q = (n_docs * 1024) // (df + 1) —
# the dedup_weighted_jaccard move, chosen because a log-IDF under
# floor() would hang the result on a libm ULP. Downstream everything
# is integer: w = tf * idf_q, L1 = SUM(w) (BIGINT), L2² = SUM(w²)
# summed in DECIMAL(38,0)/HUGEINT then cast once to DOUBLE (exact
# int -> correctly-rounded double, identical on both engines).
# 100 TB: two hash-keyed aggregates (doc×bucket, bucket) + one
# broadcast join against the <= 512-row DF table — text never joins.

_TFIDF_B = 512  # feature buckets
_TFIDF_IDF_SCALE = 1024

TFIDF_PORTABLE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id,
         CAST({md5_uniform16_sql("md5(term)")} % {_TFIDF_B} AS BIGINT)
           AS bucket,
         COUNT(*)::BIGINT AS tf
  FROM toks GROUP BY 1, 2
),
df AS (SELECT bucket, COUNT(*)::BIGINT AS df FROM tf GROUP BY bucket),
n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
w AS (
  SELECT t.doc_id,
         t.tf * ((n.n_docs * {_TFIDF_IDF_SCALE}) // (d.df + 1)) AS w
  FROM tf t JOIN df d ON t.bucket = d.bucket CROSS JOIN n
)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_buckets,
       CAST(SUM(w) AS BIGINT) AS tfidf_l1_q,
       CAST(SUM(CAST(w AS HUGEINT) * w) AS DOUBLE) AS tfidf_l2sq
FROM w GROUP BY doc_id
"""


@register("text_tfidf_portable_norms", TFIDF_PORTABLE_ORACLE)
def text_tfidf_portable_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-TF-IDF document norms with a portable md5 bucket hash and
    exact integer IDF weights: (doc_id, n_buckets, tfidf_l1_q,
    tfidf_l2sq) — the TF-IDF math is driver-checked; the MLlib
    murmur-hash tier (``text_tfidf_norms``) remains the production
    path with identical plan shape."""
    from tfm_semisup_spark.operators.layout import md5_uniform16_spark_sql

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    bucket = F.expr(
        f"CAST({md5_uniform16_spark_sql('md5(term)')} % {_TFIDF_B} AS BIGINT)"
    )
    tf = toks.select("doc_id", bucket.alias("bucket")).groupBy(
        "doc_id", "bucket"
    ).agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("bucket").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(F.broadcast(df), "bucket")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            (
                F.col("tf")
                * F.expr(f"(n_docs * {_TFIDF_IDF_SCALE}) div (df + 1)")
            ).alias("w"),
        )
    )
    return w.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("w").cast("bigint").alias("tfidf_l1_q"),
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("w"))
        .cast("double")
        .alias("tfidf_l2sq"),
    )


# Fluent corpus pipeline end-to-end: exact dedup (keeper = min id) +
# language + quality filters, as ONE composed Catalyst plan. The oracle
# reproduces the same chain relationally.
PIPELINE_ORACLE = """
WITH keepers AS (
  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
),
deduped AS (SELECT * FROM keepers WHERE rn = 1),
toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM deduped
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(w)) AS BIGINT) AS total_tokens
FROM toks
WHERE lang IN ('de', 'en')
  AND len(w) >= 20
  AND len(list_filter(w, t -> t IN ('the', 'a'))) * 1.0 / len(w) <= 0.10
GROUP BY lang
"""


@register("corpus_pipeline_end_to_end", PIPELINE_ORACLE)
def corpus_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tfm_semisup_spark.pipeline import CorpusPipeline

    docs = load_table(spark, sf_dir, "documents")
    clean = (
        CorpusPipeline.from_documents(docs)
        .dedup_exact()
        .filter_language({"en", "de"})
        .filter_quality(min_tokens=20, max_stop_ratio=0.10)
        .df()
    )
    return clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens())).cast("long").alias("total_tokens"),
    )


# Gopher/C4-style quality rule chain (operators/quality.py): per-source
# rule-fail counts + survivors. Rules are pure columnar expressions;
# the report and the filter share them, so this one query oracle-checks
# the whole rule family end-to-end.
QUALITY_RULES_ORACLE = """
WITH t AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
),
f AS (
  SELECT source,
         len(w) AS n,
         list_avg(list_transform(w, x -> len(x))) AS mwl,
         len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(w) AS alpha,
         len(list_distinct(w)) * 1.0 / len(w) AS ttr,
         len(list_distinct(list_filter(w, x -> x IN ('the', 'a')))) AS stop
  FROM t WHERE len(w) > 0
),
flags AS (
  SELECT source,
         (n BETWEEN 20 AND 1000) AS word_count,
         (mwl >= 3.0 AND mwl <= 8.0) AS mean_word_len,
         (alpha >= 0.8) AS alpha_ratio,
         (ttr >= 0.35) AS type_token_ratio,
         (stop >= 2) AS stopword_signal
  FROM f
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN NOT word_count THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
       CAST(SUM(CASE WHEN NOT mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
       CAST(SUM(CASE WHEN NOT alpha_ratio THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha_ratio,
       CAST(SUM(CASE WHEN NOT type_token_ratio THEN 1 ELSE 0 END) AS BIGINT) AS fail_type_token_ratio,
       CAST(SUM(CASE WHEN NOT stopword_signal THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopword_signal,
       CAST(SUM(CASE WHEN word_count AND mean_word_len AND alpha_ratio
                      AND type_token_ratio AND stopword_signal
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM flags
GROUP BY source
"""


@register("quality_rule_report", QUALITY_RULES_ORACLE)
def quality_rule_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule audit table: how many docs each rule kills, per
    source, plus survivors — the measure-before-you-drop report every
    corpus-prep run needs. Single narrow scan; no shuffle beyond the
    final 20-group agg."""
    from tfm_semisup_spark.operators.quality import with_quality_flags

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.where(F.size(F.filter(F.split("text", " "), lambda t: t != "")) > 0)
    flags = with_quality_flags(docs)
    rule_names = [
        "word_count",
        "mean_word_len",
        "alpha_ratio",
        "type_token_ratio",
        "stopword_signal",
    ]
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    aggs += [
        F.sum((~F.col(r)).cast("long")).alias(f"fail_{r}") for r in rule_names
    ]
    aggs.append(F.sum(F.col("quality_pass").cast("long")).alias("n_pass"))
    return flags.groupBy("source").agg(*aggs)


# Gopher's repetition rules proper (Rae et al. 2021 §A1.1): the
# fraction of a document owned by its most frequent word bigram. The
# TTR rule in operators/quality.py is the scan-speed stand-in; this is
# the exact signal, paid for with one (doc, bigram)-keyed aggregation.
REPETITION_THRESHOLD = 0.07

REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
),
bi AS (
  SELECT doc_id, source, w[i] || ' ' || w[i+1] AS g
  FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
counts AS (
  SELECT doc_id, source, g, COUNT(*) AS c FROM bi GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT doc_id, source, MAX(c) * 1.0 / SUM(c) AS frac
  FROM counts GROUP BY 1, 2
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       ROUND(AVG(frac), 4) AS avg_top_bigram_frac,
       ROUND(MAX(frac), 4) AS max_top_bigram_frac,
       CAST(SUM(CASE WHEN frac > {REPETITION_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_repetitive
FROM per_doc
GROUP BY source
ORDER BY source
"""


@register("repetition_report", REPETITION_ORACLE)
def repetition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-bigram-fraction audit. Physical shape: bigrams
    aggregate on (doc_id, xxhash64(bigram)) — 16-byte keys, map-side
    partials — then reduce to one row per doc; the bigram STRING never
    shuffles. Both aggregations key on doc_id first, so AQE coalesces
    the second into the first's partitioning at scale."""
    from tfm_semisup_spark.functions.text import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.withColumn(
        "__w", F.filter(F.split("text", " "), lambda t: t != "")
    )
    bi = (
        toks.select("doc_id", "source", F.explode(word_ngrams(F.col("__w"), 2)).alias("g"))
        .select("doc_id", "source", F.xxhash64("g").alias("g"))
    )
    per_doc = (
        bi.groupBy("doc_id", "source", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "source")
        .agg((F.max("c") * 1.0 / F.sum("c")).alias("frac"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("frac"), 4).alias("avg_top_bigram_frac"),
            F.round(F.max("frac"), 4).alias("max_top_bigram_frac"),
            F.sum((F.col("frac") > REPETITION_THRESHOLD).cast("long")).alias(
                "n_repetitive"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per language
# ---------------------------------------------------------------------------
#
# Corpus-level vocabulary profiling: for each language, the terms with
# the highest aggregate tf-idf (smoothed idf over the WHOLE corpus,
# term frequency within the language). The scale shape is wordcount-
# class: two map-side-combined aggregates on the term key (tf per
# (lang, term); document frequency per term), one scalar corpus count
# broadcast in, and a per-lang window rank over the (small) vocabulary.
# Scores are rounded on BOTH engines BEFORE the rank so last-ulp ln()
# differences cannot reorder the cut; term breaks ties.

TFIDF_TOP_N = 5
_TFIDF_SCORE = "round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6)"

TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
tf AS (
  SELECT lang, term, COUNT(*)::BIGINT AS tf
  FROM toks GROUP BY lang, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df
  FROM toks GROUP BY term
),
n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT lang, term, tf, df,
         {_TFIDF_SCORE} AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {_TFIDF_SCORE} DESC, term
         ) AS rk
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT lang, term, tf, df, tfidf, rk
FROM scored WHERE rk <= {TFIDF_TOP_N}
ORDER BY lang, rk
"""


@register("tfidf_top_terms", TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TFIDF_TOP_N terms per language by aggregate smoothed
    tf-idf: (lang, term, tf, df, tfidf, rk)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    tf = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        toks.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    scored = (
        tf.join(df, "term")
        .crossJoin(n)
        .withColumn("tfidf", F.expr(_TFIDF_SCORE))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    F.expr(_TFIDF_SCORE).desc(), "term"
                )
            ),
        )
    )
    return (
        scored.where(F.col("rk") <= TFIDF_TOP_N)
        .select("lang", "term", "tf", "df", "tfidf", "rk")
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# Distribution drift: per-source Jensen-Shannon divergence
# ---------------------------------------------------------------------------
#
# Pipeline monitoring: how far each source's token distribution sits
# from the corpus-wide distribution (JSD — symmetric, bounded by
# ln 2, zero iff identical). Detects a source going off-distribution
# between ingestion batches. Scale shape: two wordcount aggregates
# (per-source and corpus), a sources x vocabulary grid built with a
# left join so absent terms contribute p = 0, one final per-source
# sum. Everything is map-side-combinable aggregation on term keys; the
# grid is |sources| x |vocab| — at web scale ~100 x ~1M rows, far
# smaller than the corpus itself.

JSD_ORACLE = """
WITH toks AS (
  SELECT doc_id, source,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
stf AS (
  SELECT source, term, COUNT(*)::DOUBLE AS tf FROM toks GROUP BY source, term
),
stot AS (SELECT source, SUM(tf) AS tot FROM stf GROUP BY source),
ctf AS (SELECT term, COUNT(*)::DOUBLE AS tf FROM toks GROUP BY term),
ctot AS (SELECT SUM(tf) AS tot FROM ctf),
grid AS (
  SELECT s.source, c.term,
         COALESCE(st.tf, 0) / so.tot AS p,
         c.tf / ct.tot AS q
  FROM (SELECT DISTINCT source FROM stf) s
  CROSS JOIN ctf c
  CROSS JOIN ctot ct
  JOIN stot so ON so.source = s.source
  LEFT JOIN stf st ON st.source = s.source AND st.term = c.term
),
contribs AS (
  SELECT source,
         CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
         + 0.5 * q * ln(q / ((p + q) / 2)) AS contrib
  FROM grid
)
SELECT source,
       COUNT(*)::BIGINT AS n_terms,
       round(SUM(contrib), 6) AS jsd
FROM contribs
GROUP BY source
ORDER BY source
"""


@register("source_drift_jsd", JSD_ORACLE)
def source_drift_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (n_terms, jsd) vs the corpus token distribution."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    stf = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    stot = stf.groupBy("source").agg(F.sum("tf").alias("tot"))
    ctf = toks.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    ctot = F.broadcast(ctf.agg(F.sum("tf").alias("ctot")))
    grid = (
        stf.select("source").distinct()
        .crossJoin(ctf.select("term", F.col("tf").alias("c_tf")))
        .crossJoin(ctot)
        .join(stot, "source")
        .join(stf.select("source", "term", F.col("tf").alias("s_tf")),
              ["source", "term"], "left")
        .select(
            "source",
            (F.coalesce("s_tf", F.lit(0.0)) / F.col("tot")).alias("p"),
            (F.col("c_tf") / F.col("ctot")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    contrib = (
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m))
        .otherwise(F.lit(0.0))
        + 0.5 * F.col("q") * F.log(F.col("q") / m)
    )
    return (
        grid.select("source", contrib.alias("contrib"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("contrib"), 6).alias("jsd"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Unigram LM log-perplexity scoring
# ---------------------------------------------------------------------------
#
# The classic model-based quality score in corpus curation (CCNet /
# Gopher use a KenLM; the unigram LM is its SQL-expressible core):
# train P(w) = count(w)/total on the corpus itself, score each doc by
# the per-token cross-entropy -avg(ln P(w)). High scores = rare-token
# soup (boilerplate, hashes, misparsed bytes); low = common-word prose.
# Scale shape: wordcount aggregate on the term key (map-side
# combined), the vocab-sized probability table joined back to the
# token stream (term-keyed shuffle), one per-doc aggregate — the
# token stream is never joined to anything fact-sized. The score is
# rounded 6 dp on BOTH engines (last-ulp ln()/summation-order
# differences, same convention as tfidf/jsd).

_LOGPPL_SCORE = "round(-avg(ln(c * 1.0 / n)), 6)"

LOGPPL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
cnt AS (SELECT term, COUNT(*)::BIGINT AS c FROM toks GROUP BY term),
tot AS (SELECT COUNT(*)::BIGINT AS n FROM toks)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       {_LOGPPL_SCORE} AS logppl
FROM toks JOIN cnt USING (term) CROSS JOIN tot
GROUP BY doc_id
"""


@register("text_unigram_logppl", LOGPPL_ORACLE)
def text_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram cross-entropy against the corpus-trained LM:
    (doc_id, n_tokens, logppl)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    cnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = F.broadcast(toks.agg(F.count(F.lit(1)).alias("n")))
    return (
        toks.join(cnt, "term")
        .crossJoin(tot)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr(_LOGPPL_SCORE).alias("logppl"),
        )
    )

"""Text-analysis battery #2: collocation mining and boolean retrieval.

Two more operators of the text-analysis family (SURVEY.md §2.3,
extension surface alongside ``text_analysis.py`` / ``retrieval.py``):

- ``text_bigram_pmi``: adjacent-token collocations ranked by pointwise
  mutual information — the classic phrase-mining / tokenizer-merge
  signal (what BPE-style merge selection and phrase detectors compute
  at corpus scale).
- ``text_boolean_and_search``: conjunctive (AND-of-terms) boolean
  retrieval for a fixed query workload, ranked by total term
  frequency — the other half of the lexical-retrieval surface next to
  the ranked BM25 tiers.

Spark-first shapes:
- bigrams are built INSIDE each row with one ``zip_with`` over the
  token array (single F.expr — one parse, no per-node Py4J tax) and
  only then exploded: no posexplode + per-doc window shuffle of the
  full token stream. Shuffled volume is O(bigram occurrences) straight
  into a hash aggregate.
- PMI marginals (w as first word / w as second word) come from the
  bigram aggregate itself — two more hash aggregations over the
  (vocab²-bounded) bigram table, broadcast back. All counts stay exact
  integers until the final ln(), so the only cross-engine difference
  is libm ULP, rounded away; the top-k orders by the ROUNDED pmi with
  a (w1, w2) tie-break so the cutoff cannot flip.
- boolean AND filters the exploded token stream to the broadcast query
  vocabulary BEFORE any shuffle (same discipline as text_bm25_topk):
  shuffled volume is O(matching tokens), never O(corpus tokens); the
  all-terms-present test is an exact count match on the per-(doc,term)
  aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

_PMI_MIN_COUNT = 5
_PMI_TOP = 25

PMI_ORACLE = f"""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
big AS (
  SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS n
  FROM (
    SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
    FROM toks WHERE len(l) >= 2
  )
  GROUP BY p[1], p[2]
),
tot AS (SELECT SUM(n) AS n_big FROM big),
lhs AS (SELECT w1, SUM(n) AS n1 FROM big GROUP BY w1),
rhs AS (SELECT w2, SUM(n) AS n2 FROM big GROUP BY w2)
SELECT b.w1, b.w2, CAST(b.n AS BIGINT) AS n,
       ROUND(ln((CAST(b.n AS DOUBLE) * t.n_big)
                / (CAST(l.n1 AS DOUBLE) * r.n2)), 6) AS pmi
FROM big b
JOIN lhs l ON b.w1 = l.w1
JOIN rhs r ON b.w2 = r.w2
CROSS JOIN tot t
WHERE b.n >= {_PMI_MIN_COUNT}
ORDER BY pmi DESC, b.w1, b.w2
LIMIT {_PMI_TOP}
"""


@register("text_bigram_pmi", PMI_ORACLE)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-token collocations by PMI: (w1, w2, n, pmi) —
    p(x,y) over bigram occurrences, p1(x)/p2(y) the positional
    marginals of the same bigram table."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = F.expr(
        "zip_with("
        "  slice(l, 1, greatest(size(l) - 1, 0)),"
        "  slice(l, 2, greatest(size(l) - 1, 0)),"
        "  (a, b) -> struct(a AS w1, b AS w2))"
    )
    big = (
        docs.select(
            F.filter(F.split("text", " "), lambda t: t != "").alias("l")
        )
        .where(F.size("l") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = big.agg(F.sum("n").alias("n_big"))
    lhs = big.groupBy("w1").agg(F.sum("n").alias("n1"))
    rhs = big.groupBy(F.col("w2").alias("rw2")).agg(F.sum("n").alias("n2"))
    pmi = F.round(
        F.log(
            (F.col("n").cast("double") * F.col("n_big"))
            / (F.col("n1").cast("double") * F.col("n2"))
        ),
        6,
    )
    return (
        big.where(F.col("n") >= _PMI_MIN_COUNT)
        .join(F.broadcast(lhs), "w1")
        .join(F.broadcast(rhs), F.col("w2") == F.col("rw2"))
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", F.col("n").cast("bigint").alias("n"), pmi.alias("pmi")
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOP)
    )


# Fixed conjunctive query workload over the synthetic corpus vocabulary
# (TESTDATA.md): every term must be present; rank by total tf.
_BOOL_QUERIES: dict[str, tuple[str, ...]] = {
    "q_spark_join": ("spark", "join"),
    "q_hash_merge": ("hash", "merge"),
    "q_window_sort_scan": ("window", "sort", "scan"),
    "q_fast_slow": ("fast", "slow"),
}
_BOOL_TOP = 10


def _bool_query_values() -> str:
    rows = []
    for qid, terms in _BOOL_QUERIES.items():
        for t in terms:
            rows.append(f"('{qid}', '{t}', {len(terms)})")
    return ", ".join(rows)


BOOL_ORACLE = f"""
WITH queries(qid, term, n_terms) AS (VALUES {_bool_query_values()}),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
    FROM documents
  )
  WHERE term IN (SELECT term FROM queries)
  GROUP BY doc_id, term
),
matched AS (
  SELECT q.qid, tf.doc_id,
         COUNT(*) AS n_matched,
         ANY_VALUE(q.n_terms) AS n_terms,
         SUM(tf.tf) AS total_tf
  FROM tf JOIN queries q ON tf.term = q.term
  GROUP BY q.qid, tf.doc_id
)
SELECT qid, doc_id, CAST(total_tf AS BIGINT) AS total_tf
FROM (
  SELECT qid, doc_id, total_tf,
         ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY total_tf DESC, doc_id
         ) AS rk
  FROM matched WHERE n_matched = n_terms
)
WHERE rk <= {_BOOL_TOP}
"""


@register("text_boolean_and_search", BOOL_ORACLE)
def text_boolean_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive boolean retrieval for the fixed query workload:
    (qid, doc_id, total_tf) — top-10 docs per query containing ALL the
    query's terms, ranked by summed term frequency."""
    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [
            (qid, term, len(terms))
            for qid, terms in _BOOL_QUERIES.items()
            for term in terms
        ],
        "qid string, term string, n_terms int",
    )
    vocab = sorted({t for terms in _BOOL_QUERIES.values() for t in terms})
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("term"),
        )
        .where(F.col("term").isin(*vocab))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    matched = (
        tf.join(F.broadcast(queries), "term")
        .groupBy("qid", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.any_value("n_terms").alias("n_terms"),
            F.sum("tf").alias("total_tf"),
        )
        .where(F.col("n_matched") == F.col("n_terms"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("total_tf"), "doc_id")
    return (
        matched.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _BOOL_TOP)
        .select("qid", "doc_id", F.col("total_tf").cast("bigint").alias("total_tf"))
    )


# ---------------------------------------------------------------------------
# Vocabulary build + id-ization checksum (tokenize-to-ids pipeline)
# ---------------------------------------------------------------------------
#
# The LLM-prep step after cleaning/dedup: freeze a vocabulary (top-K
# tokens by frequency, deterministic (count DESC, token) rank order)
# and map the corpus to integer ids with UNK=0. Emitting the id
# ARRAYS would make the driver compare engine-repr-sensitive, so the
# query emits per-source aggregate CHECKSUMS of the mapping instead —
# sum of ids is injective enough that any rank-order or join bug
# shifts it. Scale shape: one wordcount aggregate builds the vocab
# (vocab-sized rank window), the id map rides a BROADCAST join onto
# the exploded token stream, and per-source stats are one hash
# aggregate — no token-stream shuffle beyond the wordcount itself.

_VOCAB_K = 20  # synthetic vocab is ~31 tokens; 20 leaves a REAL unk tail

VOCAB_ID_ORACLE = f"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS id
  FROM toks GROUP BY tok
  ORDER BY COUNT(*) DESC, tok
  LIMIT {_VOCAB_K}
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
       ROUND(SUM(CASE WHEN v.id IS NULL THEN 1.0 ELSE 0.0 END) / COUNT(*), 6)
         AS unk_rate,
       CAST(SUM(COALESCE(v.id, 0)) AS BIGINT) AS sum_ids
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.source
"""


@register("vocab_id_stats", VOCAB_ID_ORACLE)
def vocab_id_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen top-{k} vocabulary + id-ized corpus checksums per source:
    (source, n_tokens, n_unk, unk_rate, sum_ids).""".format(k=_VOCAB_K)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.desc("c"), "tok")
    vocab = (
        counts.orderBy(F.desc("c"), "tok")
        .limit(_VOCAB_K)
        .withColumn("id", F.row_number().over(w))
        .select("tok", "id")
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("id").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unk"),
            F.round(
                F.sum(F.when(F.col("id").isNull(), 1.0).otherwise(0.0))
                / F.count(F.lit(1)),
                6,
            ).alias("unk_rate"),
            F.sum(F.coalesce("id", F.lit(0))).cast("bigint").alias("sum_ids"),
        )
    )


# Zipf rank-frequency audit: the slope of ln(count) ~ ln(rank) over
# the head of each language's vocabulary. Natural-language corpora sit
# near slope -1 (Zipf's law); strong deviation flags boilerplate-heavy
# or templated/synthetic text — a standard corpus-health check next to
# the TTR/repetition rules (the scale-safe distributional cousin of
# quality_rule_report's per-doc signals).
#
# Shape: corpus wordcount (the only token-stream shuffle) -> per-lang
# rank window OVER THE VOCAB-SIZED AGGREGATE (same discipline as
# vocab_id_stats — never a window over the token stream) -> 30-row
# per-lang head -> closed-form OLS (covar_pop/var_pop, the
# per_nation_price_trend_ols precedent: identical estimator both
# engines). Counts stay exact integers into ln(); slope/intercept are
# rounded 4dp on both sides.
ZIPF_ORACLE = """
WITH toks AS (
  SELECT lang,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents
  WHERE text IS NOT NULL
),
wc AS (
  SELECT lang, tok, COUNT(*) AS cnt FROM toks GROUP BY lang, tok
),
ranked AS (
  SELECT lang, cnt,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY cnt DESC, tok ASC
         ) AS r
  FROM wc
),
head AS (
  SELECT lang, ln(r) AS lx, ln(cnt) AS ly FROM ranked WHERE r <= 30
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(covar_pop(lx, ly) / var_pop(lx), 4) AS zipf_slope,
       ROUND(AVG(ly) - covar_pop(lx, ly) / var_pop(lx) * AVG(lx), 4)
         AS zipf_intercept
FROM head
GROUP BY lang
"""


@register("zipf_token_audit", ZIPF_ORACLE)
def zipf_token_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf fit over the top-30 tokens: OLS slope and
    intercept of ln(count) on ln(rank), plus the head size. Output
    (lang, n_terms, zipf_slope, zipf_intercept)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "lang",
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("tok"),
    )
    wc = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tok"))
    head = (
        wc.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 30)
        .select(
            "lang",
            F.log(F.col("r").cast("double")).alias("lx"),
            F.log(F.col("cnt").cast("double")).alias("ly"),
        )
    )
    slope = F.covar_pop("lx", "ly") / F.var_pop("lx")
    return head.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round(F.avg("ly") - slope * F.avg("lx"), 4).alias("zipf_intercept"),
    )


# ---------------------------------------------------------------------------
# Cross-language vocabulary Jaccard (r10)
# ---------------------------------------------------------------------------
#
# Corpus-contamination / language-mixing audit: pairwise Jaccard
# similarity of the per-language VOCABULARIES. A high overlap between
# two languages' token sets flags mislabeled documents or
# code-switching floods — the set-level companion of
# ``lang_id_confusion``. One corpus-scale explode into a DISTINCT
# (lang, word) aggregate; the pair join then runs on the
# vocabulary-sized relation keyed on the word (equi-join, a < b
# canonical), and the Jaccard arithmetic is exact integers until the
# one 6-dp division.

LANG_VOCAB_JACCARD_ORACLE = """
WITH lw AS (
  SELECT DISTINCT lang, w FROM (
    SELECT lang,
           UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) AS w
    FROM documents
  )
),
sizes AS (SELECT lang, COUNT(*)::BIGINT AS vocab FROM lw GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*)::BIGINT AS n_shared
  FROM lw a JOIN lw b ON a.w = b.w AND a.lang < b.lang
  GROUP BY a.lang, b.lang
)
SELECT i.lang_a, i.lang_b,
       sa.vocab AS vocab_a, sb.vocab AS vocab_b, i.n_shared,
       ROUND(CAST(i.n_shared AS DOUBLE)
             / CAST(sa.vocab + sb.vocab - i.n_shared AS DOUBLE), 6)
         AS jaccard
FROM inter i
JOIN sizes sa ON i.lang_a = sa.lang
JOIN sizes sb ON i.lang_b = sb.lang
"""


@register("lang_vocab_jaccard", LANG_VOCAB_JACCARD_ORACLE)
def lang_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard of per-language vocabularies:
    (lang_a, lang_b, vocab_a, vocab_b, n_shared, jaccard)."""
    from tfm_semisup_spark.operators.lineage import truncate

    docs = load_table(spark, sf_dir, "documents")
    # the distinct (lang, word) relation is VOCAB-sized but its lineage
    # is the corpus scan + explode; three consumers (sizes + both pair
    # sides) would re-run that scan — checkpoint the grid once
    lw = truncate(
        docs.select(
            "lang",
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("w"),
        ).distinct(),
        eager=True,
    )
    sizes = lw.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab")
    )
    b = lw.select(F.col("lang").alias("lang_b"), F.col("w").alias("wb"))
    inter = (
        lw.select(F.col("lang").alias("lang_a"), "w")
        .join(b, (F.col("w") == F.col("wb")) & (F.col("lang_a") < F.col("lang_b")))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("vocab").alias("vocab_a"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("vocab").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "vocab_a",
            "vocab_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )

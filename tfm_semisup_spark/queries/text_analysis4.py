"""Text analysis #4: log-likelihood-ratio collocations.

``text_collocation_g2`` ranks adjacent-token bigrams by Dunning's G²
log-likelihood ratio (Dunning 1993) — the significance-based
collocation measure that fixes PMI's rare-event inflation
(``text_bigram_pmi`` ranks by association strength; G² by evidence).
Per bigram (w1, w2) the 2×2 contingency table over bigram positions is

    a = n(w1 w2)        b = n(w1 ·) − a
    c = n(· w2) − a     d = N − n1 − n2 + a

and G² = 2·Σ O·ln(O/E) over the four cells (0·ln 0 = 0).

Spark-first / 100 TB shape: one corpus-scale bigram groupBy, then
everything runs on the bigram grid with broadcast marginals (the PMI
plan). Arithmetic parity: every ln argument is a ratio of two EXACT
integer products (DECIMAL(38,0)/HUGEINT — cell×N products square the
bigram total, past BIGINT at ~3·10⁹ bigrams) divided once in doubles;
the four-term tree is FIXED, so the pre-round double is bit-equal
cross-engine; ordering keys on the rounded statistic + the bigram (the
BM25 sort-key discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

_G2_MIN_COUNT = 5
_G2_TOP = 25
_DEC = "decimal(38,0)"


def _g2_term_sql(o: str, num: str, den: str) -> str:
    """One O·ln(O·N/E-product) cell term with the 0·ln0 = 0 convention
    (portable SQL text: CAST/CASE/LN behave identically)."""
    return (
        f"CASE WHEN {o} = 0 THEN 0.0 ELSE CAST({o} AS DOUBLE)"
        f" * LN(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)) END"
    )


# cell counts in terms of a, n1, n2, nn (all exact integers)
_G2_CELLS = [
    ("a", "a * nn", "n1 * n2"),
    ("(n1 - a)", "(n1 - a) * nn", "n1 * (nn - n2)"),
    ("(n2 - a)", "(n2 - a) * nn", "(nn - n1) * n2"),
    ("(nn - n1 - n2 + a)", "(nn - n1 - n2 + a) * nn",
     "(nn - n1) * (nn - n2)"),
]

_G2_EXPR = "2.0 * (" + " + ".join(
    _g2_term_sql(o, num, den) for o, num, den in _G2_CELLS
) + ")"

G2_ORACLE = f"""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
big AS (
  SELECT p[1] AS w1, p[2] AS w2, COUNT(*)::HUGEINT AS a
  FROM (
    SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
    FROM toks WHERE len(l) >= 2
  )
  GROUP BY p[1], p[2]
),
tot AS (SELECT SUM(a)::HUGEINT AS nn FROM big),
lhs AS (SELECT w1, SUM(a)::HUGEINT AS n1 FROM big GROUP BY w1),
rhs AS (SELECT w2, SUM(a)::HUGEINT AS n2 FROM big GROUP BY w2),
scored AS (
  SELECT b.w1, b.w2, b.a, l.n1, r.n2, t.nn,
         ROUND({_G2_EXPR}, 6) AS g2
  FROM big b
  JOIN lhs l ON b.w1 = l.w1
  JOIN rhs r ON b.w2 = r.w2
  CROSS JOIN tot t
  WHERE b.a >= {_G2_MIN_COUNT}
)
SELECT w1, w2, a::BIGINT AS n, g2
FROM scored
ORDER BY g2 DESC, w1, w2
LIMIT {_G2_TOP}
"""


@register("text_collocation_g2", G2_ORACLE)
def text_collocation_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_G2_TOP} bigram collocations by Dunning G²:
    (w1, w2, n, g2)."""
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
        .agg(F.count(F.lit(1)).cast(_DEC).alias("a"))
    )
    tot = big.agg(F.sum("a").alias("nn"))
    lhs = big.groupBy("w1").agg(F.sum("a").alias("n1"))
    rhs = big.groupBy(F.col("w2").alias("rw2")).agg(F.sum("a").alias("n2"))
    scored = (
        big.where(F.col("a") >= _G2_MIN_COUNT)
        .join(F.broadcast(lhs), "w1")
        .join(F.broadcast(rhs), F.col("w2") == F.col("rw2"))
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "a",
            F.round(F.expr(_G2_EXPR), 6).alias("g2"),
        )
    )
    return (
        scored.orderBy(F.desc("g2"), "w1", "w2")
        .limit(_G2_TOP)
        .select("w1", "w2", F.col("a").cast("bigint").alias("n"), "g2")
    )


# ---------------------------------------------------------------------------
# Readability + lexical-diversity profile per language (r12)
# ---------------------------------------------------------------------------
#
# The corpus quality-scoring signals a readability gate consumes
# (Flesch-family components + type-token ratio), computed with EXACT
# integer arithmetic only — no formula's magic constants, just the
# quantized component ratios a downstream gate would threshold:
#
# - words_per_doc_q  = 10³ · Σtokens // n_docs
# - chars_per_word_q = 10³ · Σchars(token) // Σtokens
# - syll_per_word_q  = 10³ · Σvowel_groups // Σtokens (the classic
#   maximal-[aeiouy]+-run syllable estimate; a fixed character-class
#   regex behaves identically in Java regex and RE2)
# - ttr_q            = 10⁶ · |vocab| // Σtokens (type-token ratio)
#
# 100 TB shape: one tokenize feeding two aggregates — a per-lang sum
# pass and a per-lang distinct-term count (the wordcount shuffle).
# Everything downstream is a 2-row grid.

_READ_SCALE = 1_000

READABILITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
per_tok AS (
  SELECT lang, term, LENGTH(term)::BIGINT AS n_chars,
         len(regexp_extract_all(lower(term), '[aeiouy]+'))::BIGINT AS n_syll
  FROM toks
),
sums AS (
  SELECT lang, COUNT(*)::BIGINT AS n_tokens,
         SUM(n_chars)::BIGINT AS sum_chars,
         SUM(n_syll)::BIGINT AS sum_syll
  FROM per_tok GROUP BY lang
),
vocab AS (
  SELECT lang, COUNT(DISTINCT term)::BIGINT AS n_vocab FROM per_tok
  GROUP BY lang
),
docs_n AS (
  SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY lang
)
SELECT s.lang, d.n_docs, s.n_tokens, v.n_vocab,
       (s.n_tokens * {_READ_SCALE}) // d.n_docs AS words_per_doc_q,
       (s.sum_chars * {_READ_SCALE}) // s.n_tokens AS chars_per_word_q,
       (s.sum_syll * {_READ_SCALE}) // s.n_tokens AS syll_per_word_q,
       (v.n_vocab * 1000000) // s.n_tokens AS ttr_q
FROM sums s
JOIN vocab v ON s.lang = v.lang
JOIN docs_n d ON s.lang = d.lang
"""


@register("text_readability_scores", READABILITY_ORACLE)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language readability / lexical-diversity profile: (lang,
    n_docs, n_tokens, n_vocab, words_per_doc_q, chars_per_word_q,
    syll_per_word_q, ttr_q) — exact integer component ratios."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("term"),
    )
    per_tok = toks.select(
        "lang",
        "term",
        F.length("term").cast("bigint").alias("n_chars"),
        F.size(
            F.expr("regexp_extract_all(lower(term), '[aeiouy]+', 0)")
        )
        .cast("bigint")
        .alias("n_syll"),
    )
    sums = per_tok.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum("n_syll").cast("bigint").alias("sum_syll"),
    )
    vocab = per_tok.groupBy("lang").agg(
        F.countDistinct("term").cast("bigint").alias("n_vocab")
    )
    docs_n = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return (
        sums.join(vocab, "lang")
        .join(docs_n, "lang")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_vocab",
            F.expr(f"(n_tokens * {_READ_SCALE}) div n_docs")
            .cast("bigint")
            .alias("words_per_doc_q"),
            F.expr(f"(sum_chars * {_READ_SCALE}) div n_tokens")
            .cast("bigint")
            .alias("chars_per_word_q"),
            F.expr(f"(sum_syll * {_READ_SCALE}) div n_tokens")
            .cast("bigint")
            .alias("syll_per_word_q"),
            F.expr("(n_vocab * 1000000) div n_tokens")
            .cast("bigint")
            .alias("ttr_q"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope (r13)
# ---------------------------------------------------------------------------
#
# The corpus-health screen a training-data pipeline runs after
# dedup/selection: natural text follows freq ∝ rank^(-s) with s ≈ 1;
# a slope far from -1 flags boilerplate floods or over-aggressive
# filtering. OLS of ln(freq) on ln(rank) over the top-100 terms.
#
# Arithmetic parity: term counts and ranks are exact integers
# (ROW_NUMBER over count DESC, term ASC); each point's ln is one fixed
# libm expression FLOOR-quantized at 10^9 (identical doubles → same
# integer on both engines), so Σx, Σy, Σxy, Σx² are order-free exact
# integers (products ≤ (7·10^9)² · 100 ≈ 5·10^21 — DECIMAL(38,0)/
# HUGEINT); slope and intercept are single divisions of exact
# integers (the 10^18 scales cancel), round 6.
#
# 100 TB shape: one token explode + groupBy (hash-shuffled terms),
# TakeOrderedAndProject for the top-100; the regression runs on a
# 100-row bounded grid.

_ZIPF_TOP = 100
_ZIPF_SCALE = 1_000_000_000

ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT term, COUNT(*)::BIGINT AS c FROM tok GROUP BY term),
ranked AS (
  SELECT term, c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rnk
  FROM tf
),
pts AS (
  SELECT CAST(FLOOR(ln(CAST(rnk AS DOUBLE)) * {_ZIPF_SCALE}) AS BIGINT) AS xq,
         CAST(FLOOR(ln(CAST(c AS DOUBLE)) * {_ZIPF_SCALE}) AS BIGINT) AS yq
  FROM ranked WHERE rnk <= {_ZIPF_TOP}
),
s AS (
  SELECT COUNT(*)::HUGEINT AS n,
         SUM(xq)::HUGEINT AS sx, SUM(yq)::HUGEINT AS sy,
         SUM(xq::HUGEINT * yq)::HUGEINT AS sxy,
         SUM(xq::HUGEINT * xq)::HUGEINT AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
       ROUND((CAST(sy AS DOUBLE)
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) * sx)
             / (CAST(n AS DOUBLE) * {_ZIPF_SCALE}), 6) AS zipf_intercept
FROM s
"""


@register("zipf_term_slope", ZIPF_ORACLE)
def zipf_term_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope/intercept of ln(term frequency) on ln(rank) over the
    top-100 terms: (n_terms, zipf_slope, zipf_intercept) — healthy
    natural text sits near slope -1 (Zipf's law)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    tf = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # top-100 via orderBy+limit (TakeOrderedAndProject — per-partition
    # heaps, no global sort shuffle); the rank window then runs on the
    # bounded 100-row result only
    top = tf.orderBy(F.col("c").desc(), F.col("term")).limit(_ZIPF_TOP)
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("term"))),
    )
    pts = ranked.select(
        F.floor(F.log(F.col("rnk").cast("double")) * F.lit(_ZIPF_SCALE))
        .cast("decimal(38,0)")
        .alias("xq"),
        F.floor(F.log(F.col("c").cast("double")) * F.lit(_ZIPF_SCALE))
        .cast("decimal(38,0)")
        .alias("yq"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("xq").cast("decimal(38,0)").alias("sx"),
        F.sum("yq").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("decimal(38,0)").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return s.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / (F.col("n").cast("double") * F.lit(float(_ZIPF_SCALE))),
            6,
        ).alias("zipf_intercept"),
    )

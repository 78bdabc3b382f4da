"""Text-analysis battery #3: corpus entropy and smoothed bigram LM
perplexity.

Two more text/corpus-health operators (SURVEY.md §2.3 extension
surface, alongside ``text_analysis.py`` / ``text_analysis2.py``):

- ``token_entropy_by_lang``: Shannon entropy (nats) of the token
  distribution per language — the vocabulary-diversity / corpus-drift
  scalar (a collapsing generator or a boilerplate flood drops it;
  cross-lingual mixes are compared on it). Re-expressed as
  H = ln(N) − (Σ c·ln c)/N so every count stays an exact integer and
  the doubles only appear in the final vocab-bounded reduction.
- ``text_bigram_addk_logppl``: per-document negative mean log
  probability under an add-k (k=0.5, Jeffreys) smoothed corpus bigram
  LM — the self-perplexity quality screen (documents whose transitions
  the corpus LM finds surprising are outliers: boilerplate, encoding
  damage, language mislabels). The LM is trained on the same corpus it
  scores, the standard in-corpus audit form (same contract as
  ``text_unigram_logppl``, which this extends to order-2 context).

Spark-first / 100 TB shape:
- both are wordcount-shaped: one corpus-scale explode straight into a
  hash aggregate (map-side combine), everything after is vocab- or
  vocab²-bounded;
- bigrams are built IN-ROW with one ``zip_with`` (the
  ``text_bigram_pmi`` discipline) — no posexplode + per-doc window
  over the token stream;
- the per-document bigram table is pre-aggregated to
  (doc, w1, w2, count) BEFORE joining the LM, so the LM join moves
  O(distinct doc-bigrams), not O(token stream); the join keys on
  (w1, w2) and stays a plain shuffle join — the bigram LM is NOT
  broadcast (vocab² can be billions of rows at corpus scale);
- the smoothing constants (vocab size V, corpus totals) are single-row
  aggregates, broadcast by construction.

Parity: all counts exact integers; ln() is libm (not correctly
rounded) so every ln-carrying output is rounded to 6 dp on both sides
— the ``text_bigram_pmi`` precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

ENTROPY_ORACLE = """
WITH tok AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> ''))
           AS w
  FROM documents
),
wc AS (SELECT lang, w, COUNT(*)::BIGINT AS c FROM tok GROUP BY lang, w)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       ROUND(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
               / CAST(SUM(c) AS DOUBLE),
             6) AS entropy_nats
FROM wc
GROUP BY lang
"""


@register("token_entropy_by_lang", ENTROPY_ORACLE)
def token_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of the per-language token distribution:
    (lang, n_tokens, vocab, entropy_nats), H = ln N − (Σ c·ln c)/N."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "lang",
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("w"),
        )
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").cast("double")
    return wc.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.round(
            F.log(n) - F.sum(F.col("c").cast("double") * F.log(F.col("c"))) / n,
            6,
        ).alias("entropy_nats"),
    )


# ---------------------------------------------------------------------------
# Add-k smoothed bigram LM self-perplexity
# ---------------------------------------------------------------------------
#
# P(w2|w1) = (c(w1,w2) + K) / (c1(w1) + K·V), K = 1/2 (Jeffreys),
# V = |distinct second tokens| (the LM's event space); c1 is the
# first-position marginal of the bigram table so probabilities sum to
# (almost) 1 per context. logppl(doc) = −(Σ n·ln P)/(Σ n) over the
# doc's bigram multiset.

_ADDK_NUM = 0.5

ADDK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
doc_big AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2, COUNT(*)::BIGINT AS dn
  FROM (
    SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
    FROM toks WHERE len(l) >= 2
  )
  GROUP BY doc_id, p[1], p[2]
),
big AS (SELECT w1, w2, SUM(dn)::BIGINT AS n FROM doc_big GROUP BY w1, w2),
uni AS (SELECT w1, SUM(n)::BIGINT AS n1 FROM big GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w2)::BIGINT AS vsz FROM big)
SELECT d.doc_id,
       CAST(SUM(d.dn) AS BIGINT) AS n_bigrams,
       ROUND(-SUM(CAST(d.dn AS DOUBLE)
                  * ln((CAST(b.n AS DOUBLE) + {_ADDK_NUM})
                       / (CAST(u.n1 AS DOUBLE) + {_ADDK_NUM} * t.vsz)))
             / CAST(SUM(d.dn) AS DOUBLE),
             6) AS logppl
FROM doc_big d
JOIN big b ON d.w1 = b.w1 AND d.w2 = b.w2
JOIN uni u ON d.w1 = u.w1
CROSS JOIN v t
GROUP BY d.doc_id
"""


@register("text_bigram_addk_logppl", ADDK_ORACLE)
def text_bigram_addk_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log probability under the add-0.5
    smoothed corpus bigram LM: (doc_id, n_bigrams, logppl)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = F.expr(
        "zip_with("
        "  slice(l, 1, greatest(size(l) - 1, 0)),"
        "  slice(l, 2, greatest(size(l) - 1, 0)),"
        "  (a, b) -> struct(a AS w1, b AS w2))"
    )
    doc_big = (
        docs.select(
            "doc_id",
            F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
        )
        .where(F.size("l") >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .groupBy("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("dn"))
    )
    big = doc_big.groupBy("w1", "w2").agg(F.sum("dn").alias("n"))
    uni = big.groupBy(F.col("w1").alias("uw1")).agg(F.sum("n").alias("n1"))
    vsz = big.agg(F.countDistinct("w2").alias("vsz"))
    ln_p = F.log(
        (F.col("n").cast("double") + _ADDK_NUM)
        / (F.col("n1").cast("double") + _ADDK_NUM * F.col("vsz"))
    )
    return (
        doc_big.join(big, ["w1", "w2"])
        .join(uni, F.col("w1") == F.col("uw1"))
        .crossJoin(F.broadcast(vsz))
        .groupBy("doc_id")
        .agg(
            F.sum("dn").cast("bigint").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("dn").cast("double") * ln_p)
                / F.sum("dn").cast("double"),
                6,
            ).alias("logppl"),
        )
    )


# ---------------------------------------------------------------------------
# Positional phrase search (exact-adjacency retrieval)
# ---------------------------------------------------------------------------
#
# The third leg of the lexical-retrieval surface (BM25 ranks bags of
# words, text_boolean_and_search tests presence, THIS requires exact
# token adjacency — "merge join" the phrase, not the two words).
# Occurrences are counted on the in-row bigram/trigram streams (the
# zip_with discipline), filtered to the broadcast phrase workload
# BEFORE the shuffle, so shuffled volume is O(matching n-grams) — never
# the token stream. Top-k per phrase orders by the exact integer count
# with a doc_id tie-break.

_PHRASES_2: dict[str, tuple[str, str]] = {
    "p_spark_join": ("spark", "join"),
    "p_merge_join": ("merge", "join"),
    "p_fast_scan": ("fast", "scan"),
}
_PHRASES_3: dict[str, tuple[str, str, str]] = {
    "p_window_sort_scan": ("window", "sort", "scan"),
}
_PHRASE_TOP = 10


def _phrase2_values() -> str:
    return ", ".join(
        f"('{n}', '{w[0]}', '{w[1]}')" for n, w in sorted(_PHRASES_2.items())
    )


def _phrase3_values() -> str:
    return ", ".join(
        f"('{n}', '{w[0]}', '{w[1]}', '{w[2]}')"
        for n, w in sorted(_PHRASES_3.items())
    )


PHRASE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
big AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2, COUNT(*)::BIGINT AS n
  FROM (
    SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
    FROM toks WHERE len(l) >= 2
  ) GROUP BY 1, 2, 3
),
tri AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2, p[3] AS w3, COUNT(*)::BIGINT AS n
  FROM (
    SELECT doc_id,
           unnest(list_zip(l[1:len(l)-2], l[2:len(l)-1], l[3:len(l)])) AS p
    FROM toks WHERE len(l) >= 3
  ) GROUP BY 1, 2, 3, 4
),
hits AS (
  SELECT q.phrase, b.doc_id, b.n
  FROM (VALUES {_phrase2_values()}) AS q(phrase, w1, w2)
  JOIN big b ON b.w1 = q.w1 AND b.w2 = q.w2
  UNION ALL
  SELECT q.phrase, t.doc_id, t.n
  FROM (VALUES {_phrase3_values()}) AS q(phrase, w1, w2, w3)
  JOIN tri t ON t.w1 = q.w1 AND t.w2 = q.w2 AND t.w3 = q.w3
)
SELECT phrase, doc_id, n AS n_occurrences FROM (
  SELECT phrase, doc_id, n,
         ROW_NUMBER() OVER (
           PARTITION BY phrase ORDER BY n DESC, doc_id
         ) AS rk
  FROM hits
) WHERE rk <= {_PHRASE_TOP}
"""


@register("text_phrase_search", PHRASE_ORACLE)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-adjacency phrase retrieval for a fixed workload of 2- and
    3-word phrases: top-{k} (phrase, doc_id, n_occurrences) per
    phrase.""".format(k=_PHRASE_TOP)
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
    )
    pairs2 = F.expr(
        "zip_with("
        "  slice(l, 1, greatest(size(l) - 1, 0)),"
        "  slice(l, 2, greatest(size(l) - 1, 0)),"
        "  (a, b) -> struct(a AS w1, b AS w2))"
    )
    # trigram = zip of the bigram stream with the +2-offset token
    pairs3 = F.expr(
        "zip_with("
        "  zip_with(slice(l, 1, greatest(size(l) - 2, 0)),"
        "           slice(l, 2, greatest(size(l) - 2, 0)),"
        "           (a, b) -> struct(a AS w1, b AS w2)),"
        "  slice(l, 3, greatest(size(l) - 2, 0)),"
        "  (p, c) -> struct(p.w1 AS w1, p.w2 AS w2, c AS w3))"
    )
    q2 = spark.createDataFrame(
        [(n, w[0], w[1]) for n, w in sorted(_PHRASES_2.items())],
        "phrase string, w1 string, w2 string",
    )
    q3 = spark.createDataFrame(
        [(n, w[0], w[1], w[2]) for n, w in sorted(_PHRASES_3.items())],
        "phrase string, w1 string, w2 string, w3 string",
    )
    big = (
        docs.where(F.size("l") >= 2)
        .select("doc_id", F.explode(pairs2).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
        .join(F.broadcast(q2), ["w1", "w2"])
        .groupBy("phrase", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tri = (
        docs.where(F.size("l") >= 3)
        .select("doc_id", F.explode(pairs3).alias("p"))
        .select("doc_id", "p.w1", "p.w2", "p.w3")
        .join(F.broadcast(q3), ["w1", "w2", "w3"])
        .groupBy("phrase", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    hits = big.unionAll(tri)
    w = Window.partitionBy("phrase").orderBy(F.col("n").desc(), "doc_id")
    return (
        hits.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _PHRASE_TOP)
        .select("phrase", "doc_id", F.col("n").alias("n_occurrences"))
    )


# ---------------------------------------------------------------------------
# BPE merge candidates (tokenizer-training round 1)
# ---------------------------------------------------------------------------
#
# The first iteration of byte-pair-encoding vocabulary training
# (Sennrich et al. 2016): count adjacent symbol pairs inside words —
# the initial symbol stream is the character sequence — and rank merge
# candidates by corpus frequency. This is the inner-loop primitive of
# tokenizer training; one exact round is oracle-checkable (later
# rounds just re-run it over the merged symbol stream).
#
# 100 TB shape: the token stream is shuffled ONCE (the wordcount);
# char-pair explosion then runs over the DISTINCT word vocabulary
# weighted by word count — |vocab|·maxlen rows, orders of magnitude
# below the corpus token stream (Heaps' law) — and words are capped at
# 20 chars (longer tails are URLs/noise; cap applied identically in
# the oracle). Exact integer counts, full (pair) tie-break.

_BPE_MAX_WORD = 20
_BPE_TOP = 20

BPE_ORACLE = f"""
WITH words AS (
  SELECT w, COUNT(*)::BIGINT AS n
  FROM (
    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
    FROM documents
  )
  GROUP BY w
),
pairs AS (
  SELECT substring(w, i, 1) AS left_sym,
         substring(w, i + 1, 1) AS right_sym,
         SUM(n)::BIGINT AS pair_count
  FROM words, UNNEST(range(1, LEAST(len(w), {_BPE_MAX_WORD}))) AS t(i)
  WHERE len(w) >= 2
  GROUP BY 1, 2
)
SELECT left_sym, right_sym, pair_count
FROM pairs
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT {_BPE_TOP}
"""


@register("bpe_merge_candidates", BPE_ORACLE)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top BPE merge candidates after round 0 (adjacent character
    pairs inside words, weighted by word frequency):
    (left_sym, right_sym, pair_count)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # substring with a column start needs expr-form (F.substring takes
    # literal positions only)
    pairs = (
        words.where(F.length("w") >= 2)
        .select(
            "w",
            "n",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.length("w"), F.lit(_BPE_MAX_WORD)) - 1,
                )
            ).alias("i"),
        )
        .select(
            F.expr("substring(w, i, 1)").alias("left_sym"),
            F.expr("substring(w, i + 1, 1)").alias("right_sym"),
            "n",
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("n").cast("bigint").alias("pair_count"))
    )
    return (
        pairs.orderBy(
            F.col("pair_count").desc(), F.col("left_sym"), F.col("right_sym")
        )
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------------
# Proximity search (terms within k token positions)
# ---------------------------------------------------------------------------
#
# The fourth leg of the lexical-retrieval surface: BM25 ranks bags of
# words, text_boolean_and_search tests presence, text_phrase_search
# requires exact adjacency — THIS scores CLOSENESS (both terms within
# a k-token window, the `term1 NEAR/k term2` operator of classical IR
# engines). Token position streams are filtered to the broadcast
# query workload BEFORE any shuffle (the phrase-search discipline), so
# the position-pair join fans out only over occurrences of the query
# terms — never the token stream — and its per-doc cost is bounded by
# tf(w1)·tf(w2) of the two workload terms. Ranking is exact-integer
# (min distance asc, pair count desc, doc_id) — no float anywhere.

_PROX_PAIRS: dict[str, tuple[str, str]] = {
    "x_spark_merge": ("spark", "merge"),
    "x_vector_hash": ("vector", "hash"),
    "x_query_stream": ("query", "stream"),
}
_PROX_K = 4  # |pos1 - pos2| <= k tokens
_PROX_TOP = 10


def _prox_values() -> str:
    return ", ".join(
        f"('{n}', '{w[0]}', '{w[1]}')" for n, w in sorted(_PROX_PAIRS.items())
    )


PROXIMITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
pos AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, l[i] AS tok
  FROM toks, UNNEST(generate_series(1, len(l))) AS t(i)
),
q AS (SELECT * FROM (VALUES {_prox_values()}) AS v(query, w1, w2)),
p1 AS (SELECT q.query, p.doc_id, p.pos FROM q JOIN pos p ON p.tok = q.w1),
p2 AS (SELECT q.query, p.doc_id, p.pos FROM q JOIN pos p ON p.tok = q.w2),
hits AS (
  SELECT p1.query, p1.doc_id,
         COUNT(*)::BIGINT AS n_close,
         MIN(ABS(p1.pos - p2.pos))::BIGINT AS min_dist
  FROM p1 JOIN p2 ON p1.query = p2.query AND p1.doc_id = p2.doc_id
  WHERE ABS(p1.pos - p2.pos) <= {_PROX_K}
  GROUP BY p1.query, p1.doc_id
)
SELECT query, doc_id, n_close, min_dist FROM (
  SELECT query, doc_id, n_close, min_dist,
         ROW_NUMBER() OVER (
           PARTITION BY query
           ORDER BY min_dist, n_close DESC, doc_id
         ) AS rk
  FROM hits
) WHERE rk <= {_PROX_TOP}
"""


@register("text_proximity_search", PROXIMITY_ORACLE)
def text_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR/k proximity retrieval for a fixed two-term workload:
    top-10 (query, doc_id, n_close, min_dist) per query, ranked by
    closest co-occurrence then in-window pair count."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
    )
    pos = docs.select(
        "doc_id", F.posexplode("l").alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")
    q = spark.createDataFrame(
        [(n, w[0], w[1]) for n, w in sorted(_PROX_PAIRS.items())],
        "query string, w1 string, w2 string",
    )
    p1 = pos.join(
        F.broadcast(q.select("query", F.col("w1").alias("tok"))), "tok"
    ).select("query", "doc_id", "pos")
    p2 = pos.join(
        F.broadcast(q.select("query", F.col("w2").alias("tok"))), "tok"
    ).select(
        "query", "doc_id", F.col("pos").alias("pos2")
    )
    d = F.abs(F.col("pos") - F.col("pos2"))
    hits = (
        p1.join(p2, ["query", "doc_id"])
        .where(d <= _PROX_K)
        .groupBy("query", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_close"),
            F.min(d).cast("bigint").alias("min_dist"),
        )
    )
    w = Window.partitionBy("query").orderBy(
        F.col("min_dist"), F.col("n_close").desc(), F.col("doc_id")
    )
    return (
        hits.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _PROX_TOP)
        .select("query", "doc_id", "n_close", "min_dist")
    )


# ---------------------------------------------------------------------------
# Iterative BPE vocabulary training (multi-round merge loop)
# ---------------------------------------------------------------------------
#
# bpe_merge_candidates oracle-checks ONE pair-counting round; this is
# the actual tokenizer-training loop (Sennrich et al. 2016): R rounds
# of count-pairs -> argmax merge -> apply merge to the symbol streams.
# Spark-first/100 TB shape: after the single corpus-scale wordcount,
# ALL iteration state is the vocab-bounded (word-count, symbol-array)
# table — pair counting explodes |vocab|*maxlen rows per round, the
# winning merge is a bounded top-1 collect, and the merge APPLY is an
# in-row left-to-right `aggregate` fold over <=20-symbol arrays (the
# sanctioned interpreted-HOF case: per-item sequential semantics on a
# tiny bounded array, on a vocabulary-scale — not corpus-scale —
# relation). Each round localCheckpoints the symbol table: O(1)
# lineage across rounds, the PageRank discipline.
#
# Promoted rows-only -> oracled in r11: the FIXED round count makes
# the loop unrollable as a CTE chain (the PageRank/k-core discipline).
# The oracle encodes each word's symbol sequence as wrapped markers
# '<sym><sym>…' (the corpus alphabet is lowercase letters + space,
# TESTDATA.md, so '<'/'>' cannot collide with content), under which
# DuckDB's leftmost-non-overlapping replace('<l><r>' -> '<lr>') is
# EXACTLY the Spark fold's merge-apply semantics: a consumed symbol
# cannot re-merge within the same pass, and wrapped boundaries make
# substring confusion ('xa b' matching 'a b') impossible. Exact
# integer pair counts, full (count desc, left, right) tie-break.
# Reference-checked against a pure-Python BPE in
# tests/test_linkage_calibration.py.

_BPE_ROUNDS = 3


def _bpe_round_sql(i: int) -> str:
    """One unrolled training round: pair counts of s{i-1}, top-1 merge
    m{i}, merged symbol table s{i}."""
    return f"""
p{i} AS (
  SELECT p[1] AS l, p[2] AS r, SUM(n)::BIGINT AS c FROM (
    SELECT n, unnest(list_zip(l[1:len(l) - 1], l[2:len(l)])) AS p
    FROM (
      SELECT n, regexp_extract_all(seq, '<([^>]*)>', 1) AS l
      FROM s{i - 1}
    ) WHERE len(l) >= 2
  ) GROUP BY 1, 2
),
m{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1),
s{i} AS (
  SELECT n,
         replace(seq,
                 '<' || (SELECT l FROM m{i}) || '><'
                     || (SELECT r FROM m{i}) || '>',
                 '<' || (SELECT l FROM m{i})
                     || (SELECT r FROM m{i}) || '>') AS seq
  FROM s{i - 1}
)"""


def _bpe_train_oracle() -> str:
    rounds = "".join("," + _bpe_round_sql(i) for i in range(1, _BPE_ROUNDS + 1))
    unions = "\nUNION ALL ".join(
        f"SELECT {i}::INTEGER AS round, l AS left_sym, r AS right_sym,"
        f" c AS pair_count FROM m{i}"
        for i in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
WITH words AS (
  SELECT w, COUNT(*)::BIGINT AS n FROM (
    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
    FROM documents
  ) WHERE len(w) >= 2 AND len(w) <= {_BPE_MAX_WORD}
  GROUP BY w
),
s0 AS (
  SELECT n, regexp_replace(w, '(.)', '<\\1>', 'g') AS seq FROM words
){rounds}
{unions}
"""


def _bpe_merge_apply(left: str, right: str):
    """Left-to-right non-overlapping merge apply over the symbol array
    column ``s``: fold, replacing a trailing ``left`` when ``right``
    arrives. The winning symbols bind as ``F.lit`` columns, never
    interpolated into SQL text — corpus tokens containing a quote or
    backslash used to generate invalid SQL and crash the round
    (ADVICE r9; pinned in test_linkage_calibration.py).

    The init is a TYPED empty array literal that does NOT reference
    ``s`` (r15): the previous ``slice(s, 1, 0)`` init made every fold
    reference its child twice, so stacking the three rounds' applies
    lazily (see bpe_train_merges) would have doubled the inlined
    expression per round under CollapseProject; with a constant init
    the stacked tree grows linearly."""
    left_c, right_c = F.lit(left), F.lit(right)
    merged_c = F.lit(left + right)

    def fold(acc, x):
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left_c)
            & (x == right_c),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged_c)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.col("s"), F.expr("CAST(array() AS array<string>)"), fold
    )


@register("bpe_train_merges", _bpe_train_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of BPE merge training over the word-frequency
    table: (round, left_sym, right_sym, pair_count) — the learned
    merge sequence."""
    from tfm_semisup_spark.operators.lineage import truncate

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("w")
        )
        .where((F.length("w") >= 2) & (F.length("w") <= _BPE_MAX_WORD))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    syms = words.select("n", F.split("w", "").alias("s"))
    syms = truncate(syms, eager=True)

    pair_struct = F.expr(
        "zip_with(slice(s, 1, greatest(size(s) - 1, 0)),"
        "         slice(s, 2, greatest(size(s) - 1, 0)),"
        "         (a, b) -> struct(a AS l, b AS r))"
    )
    merges = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        pairs = (
            syms.where(F.size("s") >= 2)
            .select("n", F.explode(pair_struct).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").cast("bigint").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), "l", "r").limit(1).collect()
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rnd, left, right, cnt))
        # merge applies stack LAZILY on the checkpointed s0 (r15, guide
        # §1.2): the eager per-round truncate cost one full
        # symbol-table materialization job per round — including a
        # final one nothing consumed — for a fold that is cheap to
        # re-evaluate (vocab-bounded rows, ≤_BPE_MAX_WORD symbols).
        # Driver actions per invocation drop 7 → 4 (1 s0 checkpoint +
        # one top-1 collect per round); round R's scan re-applies the
        # R-1 previous folds in-row, linear growth with the constant
        # fold init (_bpe_merge_apply).
        syms = syms.select("n", _bpe_merge_apply(left, right).alias("s"))
    return spark.createDataFrame(
        merges, "round int, left_sym string, right_sym string, pair_count bigint"
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (r10)
# ---------------------------------------------------------------------------
#
# Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
# phrases are maximal delimiter-free token runs (length 2-4); word
# score = degree/frequency where degree counts phrase-mates (Σ phrase
# length over every phrase instance containing the word) and frequency
# counts occurrences; phrase score = Σ member-word scores. RAKE needs
# a stoplist to delimit phrases; this corpus has no natural-language
# function words, so the stoplist is DERIVED — the top-20 tokens by
# corpus frequency ((count desc, word) tie-break, exact integers,
# computed identically in both engines), the standard
# frequency-stoplist fallback of the paper.
#
# Cross-engine arithmetic: word scores are quantized to exact integer
# micro-units swq = (degree · 10^6) // freq (pmod-subtract vs HUGEINT
# //), so the per-phrase sum is an order-free integer and the single
# double division happens once per output row.
#
# Scale shape: one token explode with positions (narrow), the stoplist
# is a 20-row broadcast, islands via a doc-keyed running stopword
# count (user-keyed-window class), word/phrase stats are vocabulary-
# and phrase-grid aggregates; the final top-10 is
# TakeOrderedAndProject.

_RAKE_N_STOPS = 20
_RAKE_MIN_LEN, _RAKE_MAX_LEN = 2, 4
_RAKE_SCALE = 1_000_000

RAKE_ORACLE = f"""
WITH allw AS (
  -- parallel UNNESTs zip element-wise in DuckDB (no WITH ORDINALITY)
  SELECT doc_id, w, pos
  FROM (
    SELECT doc_id,
           UNNEST(string_split(text, ' ')) AS w,
           UNNEST(range(1, len(string_split(text, ' ')) + 1)) AS pos
    FROM documents
  )
  WHERE w <> ''
),
stops AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS c FROM allw GROUP BY w
    ORDER BY c DESC, w LIMIT {_RAKE_N_STOPS}
  )
),
toks AS (
  SELECT a.doc_id, a.w, a.pos,
         CASE WHEN s.w IS NOT NULL THEN 1 ELSE 0 END AS is_stop
  FROM allw a LEFT JOIN stops s ON a.w = s.w
),
isl AS (
  -- the running stop-count must see the STOP rows too: window first,
  -- filter outside (WHERE runs before window functions)
  SELECT doc_id, w, pos, island FROM (
    SELECT doc_id, w, pos, is_stop,
           SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS island
    FROM toks
  )
  WHERE is_stop = 0
),
phrase_inst AS (
  SELECT doc_id, island,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         COUNT(*)::BIGINT AS plen
  FROM isl GROUP BY doc_id, island
  HAVING COUNT(*) BETWEEN {_RAKE_MIN_LEN} AND {_RAKE_MAX_LEN}
),
word_stats AS (
  SELECT u.w, COUNT(*)::HUGEINT AS freq, SUM(p.plen)::HUGEINT AS deg
  FROM phrase_inst p, UNNEST(string_split(p.phrase, ' ')) AS u(w)
  GROUP BY u.w
),
swq AS (
  SELECT w, (deg * {_RAKE_SCALE}) // freq AS q FROM word_stats
),
phrases AS (
  SELECT phrase, COUNT(*)::BIGINT AS n_occ FROM phrase_inst GROUP BY phrase
),
scored AS (
  SELECT p.phrase, p.n_occ, SUM(s.q)::HUGEINT AS qsum
  FROM phrases p, UNNEST(string_split(p.phrase, ' ')) AS u(w)
  JOIN swq s ON u.w = s.w
  GROUP BY p.phrase, p.n_occ
)
SELECT phrase, n_occ,
       ROUND(CAST(qsum AS DOUBLE) / {_RAKE_SCALE}, 6) AS rake_score
FROM scored
ORDER BY qsum DESC, phrase
LIMIT 10
"""


@register("keyword_rake_top", RAKE_ORACLE)
def keyword_rake_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 RAKE keyword phrases (2-4 word runs between the derived
    top-20-frequency stopwords): (phrase, n_occ, rake_score)."""
    docs = load_table(spark, sf_dir, "documents")
    # DELIBERATELY two corpus scans (stoplist wordcount + island pass),
    # NOT a checkpoint of `allw`: the exploded (doc, pos, token) stream
    # is corpus-sized, so materializing it would store a second copy of
    # the corpus to save one narrow columnar scan — the opposite trade
    # of the day-grid/vocab-grid checkpoints elsewhere (tiny grid,
    # expensive lineage). phrase_inst below IS checkpointed (3
    # consumers, phrase-grid-sized).
    allw = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "w"),
    ).where(F.col("w") != "")
    stops = (
        allw.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(_RAKE_N_STOPS)
        .select(F.col("w").alias("stop_w"))
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos0")
    isl = (
        allw.join(F.broadcast(stops), F.col("w") == F.col("stop_w"), "left")
        .withColumn(
            "is_stop", F.when(F.col("stop_w").isNotNull(), 1).otherwise(0)
        )
        .withColumn("island", F.sum("is_stop").over(wdoc))
        .where(F.col("is_stop") == 0)
    )
    phrase_inst = (
        isl.groupBy("doc_id", "island")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos0", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("plen"),
        )
        .where(F.col("plen").between(_RAKE_MIN_LEN, _RAKE_MAX_LEN))
    )
    from tfm_semisup_spark.operators.lineage import truncate

    phrase_inst = truncate(phrase_inst, eager=True)
    word_stats = (
        phrase_inst.select(F.explode(F.split("phrase", " ")).alias("w"), "plen")
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("freq"),
            F.sum("plen").cast("decimal(38,0)").alias("deg"),
        )
    )
    num = (F.col("deg") * _RAKE_SCALE).cast("decimal(38,0)")
    swq = word_stats.select(
        "w",
        ((num - F.pmod(num, F.col("freq"))) / F.col("freq"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    phrases = phrase_inst.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )
    scored = (
        phrases.select(
            "phrase", "n_occ", F.explode(F.split("phrase", " ")).alias("w")
        )
        .join(F.broadcast(swq), "w")
        .groupBy("phrase", "n_occ")
        .agg(F.sum("q").cast("decimal(38,0)").alias("qsum"))
    )
    return (
        scored.orderBy(F.desc("qsum"), "phrase")
        .limit(10)
        .select(
            "phrase",
            "n_occ",
            F.round(
                F.col("qsum").cast("double") / _RAKE_SCALE, 6
            ).alias("rake_score"),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer fertility by language (train -> apply -> measure, r11)
# ---------------------------------------------------------------------------
#
# The readout that closes the tokenizer-training loop: after learning
# the _BPE_ROUNDS merges on the GLOBAL word-frequency table (exactly
# bpe_train_merges' algebra), apply them to every BPE-eligible word
# and report per-language fertility — symbols per word token before
# and after merging, and the compression ratio. The multilingual-
# tokenizer-equity metric (a language whose frequent words never win
# merges pays more symbols per word).
#
# Oracle: the same wrapped-marker unrolled chain as bpe_train_merges,
# but s0..s3 KEEP the word key so the per-(lang, word) counts join
# back to the merged symbol sequences; symbol counts come from
# len(regexp_extract_all(seq, '<([^>]*)>')). All integer sums; the
# single compression division is an exact integer floor division.


def _bpe_fertility_oracle() -> str:
    rounds = []
    for i in range(1, _BPE_ROUNDS + 1):
        rounds.append(f"""
p{i} AS (
  SELECT p[1] AS l, p[2] AS r, SUM(n)::BIGINT AS c FROM (
    SELECT n, unnest(list_zip(l[1:len(l) - 1], l[2:len(l)])) AS p
    FROM (
      SELECT n, regexp_extract_all(seq, '<([^>]*)>', 1) AS l
      FROM s{i - 1}
    ) WHERE len(l) >= 2
  ) GROUP BY 1, 2
),
m{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1),
s{i} AS (
  SELECT w, n,
         replace(seq,
                 '<' || (SELECT l FROM m{i}) || '><'
                     || (SELECT r FROM m{i}) || '>',
                 '<' || (SELECT l FROM m{i})
                     || (SELECT r FROM m{i}) || '>') AS seq
  FROM s{i - 1}
)""")
    return f"""
WITH words AS (
  SELECT w, COUNT(*)::BIGINT AS n FROM (
    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
    FROM documents
  ) WHERE len(w) >= 2 AND len(w) <= {_BPE_MAX_WORD}
  GROUP BY w
),
s0 AS (
  SELECT w, n, regexp_replace(w, '(.)', '<\\1>', 'g') AS seq FROM words
),{",".join(rounds)},
langwords AS (
  SELECT lang, w, COUNT(*)::BIGINT AS n FROM (
    SELECT lang,
           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
    FROM documents
  ) WHERE len(w) >= 2 AND len(w) <= {_BPE_MAX_WORD}
  GROUP BY lang, w
),
merged AS (
  SELECT w, len(regexp_extract_all(seq, '<([^>]*)>', 1))::BIGINT
           AS len_after
  FROM s{_BPE_ROUNDS}
)
SELECT lw.lang,
       SUM(lw.n)::BIGINT AS n_word_tokens,
       SUM(lw.n * len(lw.w))::BIGINT AS symbols_before,
       SUM(lw.n * m.len_after)::BIGINT AS symbols_after,
       CAST((SUM(lw.n * m.len_after) * 1000000)
            // SUM(lw.n * len(lw.w)) AS BIGINT) AS compression_ppm
FROM langwords lw JOIN merged m ON lw.w = m.w
GROUP BY lw.lang
"""


@register("bpe_fertility_by_lang", _bpe_fertility_oracle())
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language BPE fertility after the {_BPE_ROUNDS} learned
    merges: (lang, n_word_tokens, symbols_before, symbols_after,
    compression_ppm)."""
    from tfm_semisup_spark.operators.lineage import truncate

    docs = load_table(spark, sf_dir, "documents")
    tok = F.filter(F.split("text", " "), lambda t: t != "")
    eligible = (F.length("w") >= 2) & (F.length("w") <= _BPE_MAX_WORD)
    words = (
        docs.select(F.explode(tok).alias("w"))
        .where(eligible)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    syms = truncate(words.select("w", "n", F.split("w", "").alias("s")),
                    eager=True)
    pair_struct = F.expr(
        "zip_with(slice(s, 1, greatest(size(s) - 1, 0)),"
        "         slice(s, 2, greatest(size(s) - 1, 0)),"
        "         (a, b) -> struct(a AS l, b AS r))"
    )
    for _ in range(_BPE_ROUNDS):
        pairs = (
            syms.where(F.size("s") >= 2)
            .select("n", F.explode(pair_struct).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").cast("bigint").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), "l", "r").limit(1).collect()
        if not top:
            break
        # lazy merge-apply stack on the checkpointed s0 (r15): same
        # 7 → 4 driver-job reduction as bpe_train_merges; the final
        # fertility join evaluates the ≤3 stacked folds in-row over
        # the vocab-bounded table
        syms = syms.select(
            "w", "n", _bpe_merge_apply(top[0]["l"], top[0]["r"]).alias("s")
        )
    merged = syms.select("w", F.size("s").cast("bigint").alias("len_after"))
    langwords = (
        docs.select("lang", F.explode(tok).alias("w"))
        .where(eligible)
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return (
        langwords.join(F.broadcast(merged), "w")
        .groupBy("lang")
        .agg(
            F.sum("n").cast("bigint").alias("n_word_tokens"),
            F.sum(F.col("n") * F.length("w"))
            .cast("bigint")
            .alias("symbols_before"),
            F.sum(F.col("n") * F.col("len_after"))
            .cast("bigint")
            .alias("symbols_after"),
            F.expr(
                "CAST((SUM(n * len_after) * 1000000)"
                " div SUM(n * length(w)) AS BIGINT)"
            ).alias("compression_ppm"),
        )
    )

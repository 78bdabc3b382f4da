"""Lexical retrieval + string-metric dedup verification.

Two operators a training-data pipeline needs beyond embedding search
(SURVEY.md §2.3 text-analysis family):

- ``text_bm25_topk``: Okapi BM25 scoring of the corpus against a fixed
  query term set, top-k docs. Fully SQL-expressible, so it carries a
  DuckDB oracle — unlike the ANN tiers this is an EXACT lexical
  ranking both engines can agree on bit-for-bit after rounding.
- ``dedup_editdist_pairs``: near-duplicate pairs found by cheap
  blocking (lang + character-length bucket) and VERIFIED by
  Levenshtein distance on a bounded prefix. Both Spark and DuckDB
  implement standard Levenshtein, so the verification itself is
  oracled — the one near-dup tier in the suite where the distance
  metric (not just the pair membership) is driver-checked.

100 TB design notes:
- BM25 against a FIXED query never materializes full posting lists:
  tokens are exploded and immediately filtered to the (broadcast-sized)
  query vocabulary, so the shuffled volume is O(matching tokens), not
  O(corpus tokens). Document length and the corpus avgdl are one
  columnar projection + one scalar aggregate. For query WORKLOADS
  (many queries) ``build_bm25_stats`` precomputes postings/dl/df/avgdl
  once and ``text_bm25_workload_topk`` scores a whole query batch in
  one pass against them — the per-query plan in ``text_bm25_topk`` is
  the ad-hoc shape.
- Edit-distance verification is quadratic PER BLOCK, so the blocking
  key bounds the damage: (lang, floor(n_chars/10)) keeps blocks at a
  few dozen docs; the Levenshtein operand is capped at a 120-char
  prefix so each comparison is O(120^2) regardless of document size.
  At corpus scale the candidate generator would be the banded-MinHash
  tier (operators/dedup.py) with this same verify step; the blocked
  variant is the oracle-able demonstration of the verifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

# Query vocabulary for the BM25 demo (drawn from the synthetic corpus'
# vocabulary, TESTDATA.md).
_BM25_TERMS = ("spark", "join", "hash")
_K1 = 1.2
_B = 0.75

BM25_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS dl
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM toks
), tf AS (
  SELECT d.doc_id, d.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
    FROM documents
  ) d
  WHERE d.term IN ('spark', 'join', 'hash')
  GROUP BY d.doc_id, d.term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
)
SELECT doc_id, bm25 FROM (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * (1.2 + 1)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * toks.dl / s.avgdl))
         ), 4) AS bm25
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN toks ON tf.doc_id = toks.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
ORDER BY bm25 DESC, doc_id
LIMIT 15
"""


@register("text_bm25_topk", BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-15 for the fixed query {spark, join, hash}
    (k1=1.2, b=0.75, the Robertson/Sparck-Jones '+1' idf). The final
    sort keys on the ROUNDED score + doc_id so engine-level summation
    ULP cannot flip the cutoff row."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    dl_df = docs.select("doc_id", F.size(toks).alias("dl"))
    stats = dl_df.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    weight = (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df_tbl), "term")
        .join(dl_df, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(weight), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(15)
    )


def build_bm25_stats(
    docs: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Materialize the BM25 index side tables ONCE per corpus — the
    shape a real retrieval WORKLOAD runs (VERDICT r4 #5), as opposed
    to ``text_bm25_topk``'s ad-hoc single-query plan that re-derives
    them inline.

    Returns ``(postings, doc_len, term_df, stats)``:

    - ``postings``: (doc_id, term, tf) — full term-frequency postings;
    - ``doc_len``: (doc_id, dl) — whitespace token count per doc;
    - ``term_df``: (term, df) — corpus-wide document frequency for the
      ENTIRE vocabulary (not just one query's terms);
    - ``stats``: single row (n_docs, avgdl).

    100 TB design: the explode + two hash aggregations are the
    expensive passes and they run once per corpus snapshot (in a real
    deployment each would be written as a bucketed-by-term /
    bucketed-by-doc_id parquet table); every query thereafter touches
    only the postings rows matching its terms — O(matching tokens)
    per query, never a corpus rescan. df for a query term is
    identical whether computed corpus-wide or query-filtered, so the
    precomputed tables change nothing about scores — only about cost.
    """
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    doc_len = docs.select("doc_id", F.size(toks).alias("dl"))
    postings = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # (doc_id, term) is distinct after the groupBy, so df is a plain
    # count — no countDistinct shuffle needed.
    term_df = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    stats = doc_len.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return postings, doc_len, term_df, stats


# The workload demo: three queries scored in ONE pass over the
# precomputed stats, top-5 docs each.
_WORKLOAD_QUERIES = (
    ("q1", "spark"),
    ("q1", "join"),
    ("q1", "hash"),
    ("q2", "window"),
    ("q2", "sort"),
    ("q2", "merge"),
    ("q3", "stream"),
    ("q3", "batch"),
)

BM25_WORKLOAD_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS dl
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM toks
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
    FROM documents
  ) d
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), q(query_id, term) AS (
  VALUES ('q1','spark'),('q1','join'),('q1','hash'),
         ('q2','window'),('q2','sort'),('q2','merge'),
         ('q3','stream'),('q3','batch')
), scored AS (
  SELECT q.query_id, tf.doc_id,
         ROUND(SUM(
           ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * (1.2 + 1)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * toks.dl / s.avgdl))
         ), 4) AS bm25
  FROM tf
  JOIN q ON tf.term = q.term
  JOIN df ON tf.term = df.term
  JOIN toks ON tf.doc_id = toks.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id, bm25, CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT query_id, doc_id, bm25,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id) AS rnk
  FROM scored
)
WHERE rnk <= 5
"""


@register("text_bm25_workload_topk", BM25_WORKLOAD_ORACLE)
def text_bm25_workload_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 query WORKLOAD over precomputed index stats
    (``build_bm25_stats``): three queries scored in one pass, top-5
    per query — (query_id, doc_id, bm25, rank). Ranking keys on the
    ROUNDED score + doc_id (the repo's quantize-then-rank rule) so
    summation-order ULPs can't swap ranks across engines."""
    from pyspark.sql import Window

    from tfm_semisup_spark.operators.lineage import release, truncate

    docs = load_table(spark, sf_dir, "documents")
    postings, doc_len, term_df, stats = build_bm25_stats(docs)
    # Materialize postings ONCE: df derives from it and the score join
    # consumes it again — unchecked, that is two full corpus explodes
    # (the inline stand-in for the bucketed postings TABLE a real
    # deployment writes; measured 1.45 -> 1.13s at sf0.1, r5).
    # r14 examined, kept AS-IS: filtering the postings to the 8
    # workload terms BEFORE the aggregate measured SLOWER (2.40 s vs
    # 1.82 s interleaved medians at sf0.1) — the per-token broadcast
    # probe costs more than the map-side-combined exchange it saves,
    # the same negative result as retrieval_eval_mrr/retrieval_rrf.
    postings = truncate(postings)
    term_df = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    qdf = spark.createDataFrame(
        list(_WORKLOAD_QUERIES), "query_id string, term string"
    )
    # The query table is workload-bounded: broadcast it into the
    # postings (this is the only hint — term_df/doc_len grow with the
    # corpus and join unhinted; after the vocab filter both sides are
    # tiny and AQE broadcasts at runtime).
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    weight = (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        postings.join(F.broadcast(qdf), "term")
        .join(term_df, "term")
        .join(doc_len, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(weight), 4).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), "doc_id")
    out = truncate(
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 5)
        .select("query_id", "doc_id", "bm25", "rank")
    )
    release(postings)
    return out


EDITDIST_ORACLE = """
SELECT id1, id2, edit_dist FROM (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         CAST(levenshtein(substring(a.text, 1, 120),
                          substring(b.text, 1, 120)) AS BIGINT) AS edit_dist
  FROM documents a
  JOIN documents b
    ON a.lang = b.lang
   AND CAST(floor(a.n_chars / 10) AS BIGINT) = CAST(floor(b.n_chars / 10) AS BIGINT)
   AND a.doc_id < b.doc_id
)
WHERE edit_dist <= 50
ORDER BY edit_dist, id1, id2
"""


@register("dedup_editdist_pairs", EDITDIST_ORACLE)
def dedup_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked + Levenshtein-verified near-dup pairs. Blocking:
    (lang, floor(n_chars/10)); verify: edit distance of the 120-char
    prefixes <= 50. The equi-join on the block key is an ordinary
    shuffle join — no cross join appears in the plan; the id1 < id2
    condition dedups the symmetric pair."""
    docs = load_table(spark, sf_dir, "documents")
    block = F.floor(F.col("n_chars") / 10).cast("bigint")
    # The corpus parquet is a single split at test SFs and the rows are
    # tiny, so AQE coalesces a column-only repartition back to ~1
    # partition — and ALL the Levenshtein DP (the real cost here; the
    # bytes are irrelevant) runs in ONE task. An EXPLICIT partition
    # count is exempt from AQE coalescing and keeps the CPU-bound
    # verify spread across the cluster: the partitioning rule for
    # heavy-expression-over-small-data stages is "size by CPU, not by
    # bytes".
    a = docs.repartition(64, F.col("lang"), block).select(
        F.col("doc_id").alias("id1"),
        F.col("lang").alias("lang_a"),
        block.alias("block_a"),
        F.substring("text", 1, 120).alias("prefix_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("id2"),
        F.col("lang").alias("lang_b"),
        block.alias("block_b"),
        F.substring("text", 1, 120).alias("prefix_b"),
    )
    return (
        a.join(
            b,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("block_a") == F.col("block_b"))
            & (F.col("id1") < F.col("id2")),
        )
        .select(
            "id1",
            "id2",
            # threshold form: banded DP, O(len * threshold) per pair
            # instead of O(len^2); returns -1 past the threshold and
            # the exact distance within it, so filtering >= 0 keeps
            # the identical pair set and values as DuckDB's full
            # levenshtein <= 50. ONE filter reference on purpose:
            # Catalyst collapses the projection into the join's
            # residual condition, so every comparison in this filter
            # re-evaluates the levenshtein per candidate pair.
            F.levenshtein("prefix_a", "prefix_b", 50)
            .cast("bigint")
            .alias("edit_dist"),
        )
        .where(F.col("edit_dist") >= 0)
        .orderBy("edit_dist", "id1", "id2")
    )


# ---------------------------------------------------------------------------
# Retrieval evaluation metrics: MRR + recall@10 (r12)
# ---------------------------------------------------------------------------
#
# The offline eval-harness shape every retrieval deployment runs
# nightly: a query workload, a qrels relation, a system ranking, and
# rank metrics. Here both sides are derived so the whole job is
# oracle-checkable with EXACT integers:
#
# - qrels: relevant(q, d) iff d contains ALL of q's terms (conjunctive
#   boolean relevance — the text_boolean_retrieval semantics);
# - system: rank candidate docs (matching ANY term) by total matched
#   term frequency (tf_sum DESC, doc_id) — the IDF-free lexical
#   baseline; integer keys give a total order, so ranks are identical
#   on both engines (no BM25 ln in the metric path);
# - metrics per query: n_relevant, first_rank, RR = 10⁶ // first_rank,
#   recall@10 = 10⁶ · |relevant ∩ top-10| // n_relevant — all integer
#   floor arithmetic, empty-qrels queries pinned to 0.
#
# 100 TB shape: candidates are term-posting-bounded (the workload's
# terms only), the per-query rank window partitions by query_id over
# those bounded candidate sets, and qrels derive from the same matched
# relation — one corpus tokenize feeds everything.

_EVAL_RR_SCALE = 1_000_000
_EVAL_K = 10

_EVAL_Q_VALUES = ",".join(f"('{q}','{t}')" for q, t in _WORKLOAD_QUERIES)

RETRIEVAL_EVAL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS c FROM toks GROUP BY doc_id, term
),
q(query_id, term) AS (VALUES {_EVAL_Q_VALUES}),
qn AS (SELECT query_id, COUNT(*)::BIGINT AS n_terms FROM q GROUP BY query_id),
matched AS (
  SELECT q.query_id, tf.doc_id, SUM(tf.c)::BIGINT AS tf_sum,
         COUNT(*)::BIGINT AS n_matched_terms
  FROM tf JOIN q ON tf.term = q.term
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, n_matched_terms,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY tf_sum DESC, doc_id) AS rnk
  FROM matched
),
rel AS (
  SELECT r.query_id, r.doc_id, r.rnk
  FROM ranked r JOIN qn ON r.query_id = qn.query_id
  WHERE r.n_matched_terms = qn.n_terms
)
SELECT qn.query_id,
       COUNT(r.doc_id)::BIGINT AS n_relevant,
       COALESCE(MIN(r.rnk), 0)::BIGINT AS first_rank,
       (CASE WHEN COUNT(r.doc_id) = 0 THEN 0
             ELSE {_EVAL_RR_SCALE} // MIN(r.rnk) END)::BIGINT AS rr_q,
       (CASE WHEN COUNT(r.doc_id) = 0 THEN 0
             ELSE (SUM(CASE WHEN r.rnk <= {_EVAL_K} THEN 1 ELSE 0 END)
                   * {_EVAL_RR_SCALE}) // COUNT(r.doc_id) END)::BIGINT
         AS recall10_q
FROM qn LEFT JOIN rel r ON qn.query_id = r.query_id
GROUP BY qn.query_id
"""


@register("retrieval_eval_mrr", RETRIEVAL_EVAL_ORACLE)
def retrieval_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline retrieval eval over the standard workload: (query_id,
    n_relevant, first_rank, rr_q, recall10_q) — conjunctive-boolean
    qrels vs the exact-integer TF ranking, MRR/recall@10 as integer
    floor arithmetic."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("term"),
    )
    qdf = spark.createDataFrame(
        list(_WORKLOAD_QUERIES), "query_id string, term string"
    )
    qn = qdf.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms")
    )
    # r14 examined, kept AS-IS: two candidate rewrites (filter tokens
    # by the broadcast workload term set BEFORE the (doc, term)
    # aggregate; group raw matched tokens with countDistinct) both
    # measured SLOWER than this form in interleaved same-session A/Bs
    # at sf0.1 (1.39 s vs 2.17 s / 1.81 s vs 2.01 s medians, order
    # swapped to rule out bias): the per-token broadcast probe over
    # the full token stream costs more than the map-side-combined
    # (doc, term) exchange it would save. Guide §1.1's "fresh ideal
    # plan is usually slower" case — empirical loop wins.
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    matched = (
        tf.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("c").alias("tf_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n_matched_terms"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("tf_sum").desc(), "doc_id"
    )
    ranked = matched.withColumn("rnk", F.row_number().over(w))
    rel = ranked.join(F.broadcast(qn), "query_id").where(
        F.col("n_matched_terms") == F.col("n_terms")
    )
    agg = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_relevant"),
        F.min("rnk").cast("bigint").alias("first_rank"),
        F.sum(F.when(F.col("rnk") <= _EVAL_K, 1).otherwise(0)).alias("hits10"),
    )
    return (
        qn.join(agg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_relevant"), F.lit(0))
            .cast("bigint")
            .alias("n_relevant"),
            F.coalesce(F.col("first_rank"), F.lit(0))
            .cast("bigint")
            .alias("first_rank"),
            F.when(F.coalesce(F.col("n_relevant"), F.lit(0)) == 0, F.lit(0))
            .otherwise(F.expr(f"{_EVAL_RR_SCALE} div first_rank"))
            .cast("bigint")
            .alias("rr_q"),
            F.when(F.coalesce(F.col("n_relevant"), F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.expr(f"(hits10 * {_EVAL_RR_SCALE}) div n_relevant")
            )
            .cast("bigint")
            .alias("recall10_q"),
        )
    )

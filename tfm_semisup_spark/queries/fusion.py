"""Hybrid retrieval: reciprocal-rank fusion of dense + lexical lists.

``retrieval_rrf_hybrid`` runs the standard two-tower hybrid-search
shape over the aligned documents/embeddings tables (vec_id == doc_id,
TESTDATA.md): for each anchor document,

- a DENSE candidate list — brute cosine against the anchor embedding
  (the similarity_cosine_topk tier; broadcast anchors, zero shuffle);
- a LEXICAL candidate list — rarity-weighted TF overlap
  ("more-like-this"): score = Σ_t tf_q(t)·tf_d(t)·floor(10⁹ / df_t),
  exact integer (the dedup rarity-weight idiom). The synthetic corpus
  has a ~31-term vocabulary where every term lands in ~78% of docs
  (TESTDATA.md), so a distinct-term rare-word score is degenerate —
  TF weighting is what discriminates here. Candidate generation runs
  through the inverted-index equi-join with a boilerplate cap
  (df·10 <= 9·n_docs) so a truly corpus-wide term never fans out;

then fuses them with reciprocal-rank fusion (Cormack, Clarke &
Büttcher 2009): rrf(d) = Σ_lists 1/(K + rank_d), K = 60, quantized to
floor(10⁹/(K+r)) so the fused score is an exact BIGINT sum of two
integer terms.

No reference analog (extension surface; the RAG-retrieval composition
leg on top of the BM25/cosine tiers).

Determinism: each list ranks by (ROUNDED score DESC, doc_id) — dense
rounds cosine to 4 dp before ranking (the text_bm25_topk sort-key
discipline), lexical scores are exact integers — so ranks, and hence
the fused order, are engine-independent.

100 TB shape: the dense leg is a narrow scan against 3 broadcast
anchors (TakeOrderedAndProject per anchor); the lexical leg's join
fans out Σ df over the capped anchor terms — linear in docs. A
corpus-scale serving path would swap in the IVF tier + impact-ordered
postings (WAND); the fusion algebra is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.functions.vector import cosine_similarity_fixed
from tfm_semisup_spark.io import embedding_dim, load_table
from tfm_semisup_spark.queries import register

_ANCHORS = (0, 7, 13)
_CAND = 30  # per-list candidate depth
_RRF_K = 60
_RRF_SCALE = 1_000_000_000
_W_SCALE = 1_000_000_000
_FUSED_TOP = 10

_ANCHOR_LIST = ", ".join(str(a) for a in _ANCHORS)

RRF_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN ({_ANCHOR_LIST})
),
dscore AS (
  SELECT q.query_id, e.vec_id AS doc_id,
         ROUND(list_inner_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_inner_product(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]))
                  * sqrt(list_inner_product(q.qv, q.qv))), 4) AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
dtop AS (
  SELECT query_id, doc_id, r FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, doc_id) AS r
    FROM dscore
  ) WHERE r <= {_CAND}
),
tf AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
    FROM documents
  ) GROUP BY doc_id, term
),
ndocs AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
df AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term),
qterms AS (
  SELECT t.doc_id AS query_id, t.term, t.tf * ({_W_SCALE} // d.df) AS w
  FROM tf t JOIN df d ON t.term = d.term CROSS JOIN ndocs
  WHERE t.doc_id IN ({_ANCHOR_LIST}) AND d.df * 10 <= 9 * ndocs.n_docs
),
lscore AS (
  SELECT qt.query_id, t.doc_id, SUM(qt.w * t.tf)::BIGINT AS lex
  FROM qterms qt JOIN tf t ON qt.term = t.term
  WHERE t.doc_id <> qt.query_id
  GROUP BY qt.query_id, t.doc_id
),
ltop AS (
  SELECT query_id, doc_id, r FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY lex DESC, doc_id) AS r
    FROM lscore
  ) WHERE r <= {_CAND}
),
fused AS (
  SELECT COALESCE(d.query_id, l.query_id) AS query_id,
         COALESCE(d.doc_id, l.doc_id) AS doc_id,
         COALESCE(d.r, 0) AS rank_dense,
         COALESCE(l.r, 0) AS rank_lex,
         (CASE WHEN d.r IS NULL THEN 0
               ELSE {_RRF_SCALE} // ({_RRF_K} + d.r) END
          + CASE WHEN l.r IS NULL THEN 0
                 ELSE {_RRF_SCALE} // ({_RRF_K} + l.r) END)::BIGINT AS rrf_q
  FROM dtop d
  FULL OUTER JOIN ltop l
    ON d.query_id = l.query_id AND d.doc_id = l.doc_id
)
SELECT query_id, doc_id, rank_dense::BIGINT AS rank_dense,
       rank_lex::BIGINT AS rank_lex, rrf_q
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_q DESC, doc_id) AS rk
  FROM fused
) WHERE rk <= {_FUSED_TOP}
"""


@register("retrieval_rrf_hybrid", RRF_ORACLE)
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-anchor fused top-{_FUSED_TOP}: (query_id, doc_id,
    rank_dense, rank_lex, rrf_q); 0 marks absence from that list."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "emb_d", F.col("embedding").cast("array<double>")
    )
    dim = embedding_dim(sf_dir)
    q = emb.where(F.col("vec_id").isin(*_ANCHORS)).select(
        F.col("vec_id").alias("query_id"), F.col("emb_d").alias("qv")
    )
    dscore = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_similarity_fixed("emb_d", "qv", dim), 4).alias(
                "sim"
            ),
        )
    )
    wq = Window.partitionBy("query_id")
    dtop = (
        dscore.withColumn(
            "r",
            F.row_number().over(wq.orderBy(F.col("sim").desc(), "doc_id")),
        )
        .where(F.col("r") <= _CAND)
        .select("query_id", "doc_id", "r")
    )

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = tf.localCheckpoint(eager=True)
    ndocs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        tf.where(F.col("doc_id").isin(*_ANCHORS))
        .withColumnRenamed("doc_id", "query_id")
        .join(df_tbl, "term")
        .crossJoin(F.broadcast(ndocs))
        .where(F.col("df") * 10 <= 9 * F.col("n_docs"))
        .select(
            "query_id",
            "term",
            (F.col("tf") * F.expr(f"{_W_SCALE} div df")).alias("w"),
        )
    )
    lscore = (
        qterms.join(tf, "term")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("w") * F.col("tf")).cast("bigint").alias("lex"))
    )
    ltop = (
        lscore.withColumn(
            "r",
            F.row_number().over(wq.orderBy(F.col("lex").desc(), "doc_id")),
        )
        .where(F.col("r") <= _CAND)
        .select("query_id", "doc_id", F.col("r").alias("rl"))
    )

    fused = (
        dtop.join(ltop, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce(F.col("r"), F.lit(0)).cast("bigint").alias(
                "rank_dense"
            ),
            F.coalesce(F.col("rl"), F.lit(0)).cast("bigint").alias(
                "rank_lex"
            ),
            (
                F.when(
                    F.col("r").isNull(), F.lit(0).cast("bigint")
                ).otherwise(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + r)"))
                + F.when(
                    F.col("rl").isNull(), F.lit(0).cast("bigint")
                ).otherwise(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rl)"))
            )
            .cast("bigint")
            .alias("rrf_q"),
        )
    )
    return (
        fused.withColumn(
            "rk",
            F.row_number().over(wq.orderBy(F.col("rrf_q").desc(), "doc_id")),
        )
        .where(F.col("rk") <= _FUSED_TOP)
        .select("query_id", "doc_id", "rank_dense", "rank_lex", "rrf_q")
    )

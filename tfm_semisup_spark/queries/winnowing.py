"""Winnowing document fingerprints (MOSS) — local-min k-gram
selection + fingerprint-join near-dup pairs.

``dedup_winnowing_pairs`` implements the winnowing algorithm of
Schleimer, Wilkerson & Aiken (SIGMOD 2003, the MOSS plagiarism
detector): hash every word k-gram, slide a window of ``_W`` positions
over the hash sequence, and keep each window's MINIMUM hash as a
fingerprint. Winnowing guarantees any shared run of >= _W + _K - 1
tokens produces at least one shared fingerprint, while storing only
~2/(_W+1) of the k-grams — the classic density/guarantee trade that
MinHash (set-level) and the substring-dup suffix report (exact spans)
don't occupy: winnowing is POSITION-LOCAL, so it detects partial
overlap between otherwise different documents.

This is value-set winnowing: the fingerprint set is the distinct
window-min hash values per document (position metadata dropped once
selected), which keeps the operator pure-columnar on both engines.

No reference analog (extension surface); parameters follow the paper
(window w=4, k-gram k=3 words).

Spark-first / 100 TB shape:
- k-gram construction is explode(sequence) + element_at over the
  pre-split token array (the BPE-query idiom; whole-stage codegen,
  no interpreted HOF in the hot path);
- the window-min runs per document ordered by position — one shuffle
  keyed on doc_id, frames bounded by _W;
- the pair join is fingerprint-value blocked (the hashed-shingle
  discipline) with a document-frequency cap dropping boilerplate
  fingerprints shared by > _FP_DF_CAP docs, so no hash value can
  induce a quadratic bucket (same cap on both engines: the CAPPED
  semantics IS the query);
- all scores exact BIGINT (integer floor division for containment);
  hashes are the portable two-slice md5 decode (32 bits) shared with
  the bloom screen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.layout import (
    md5_uniform16_spark_sql,
    md5_uniform16_sql,
)
from tfm_semisup_spark.queries import register

_K = 3  # words per k-gram
_W = 4  # winnowing window (positions per min-selection)
_FP_DF_CAP = 50  # fingerprints shared by more docs are boilerplate
_MIN_SHARED = 3  # report pairs sharing >= this many fingerprints
_TOP = 25
_CONT_SCALE = 1_000_000

_SH_MD5 = "md5(sh)"
# portable 32-bit hash: two independent 16-bit slices of one digest
_H32_SQL = (
    f"(CAST({md5_uniform16_sql(_SH_MD5)} AS BIGINT) * 65536 + "
    f"{md5_uniform16_sql(_SH_MD5, start=5)})"
)
_H32_SPARK = (
    f"(CAST({md5_uniform16_spark_sql(_SH_MD5)} AS BIGINT) * 65536 + "
    f"{md5_uniform16_spark_sql(_SH_MD5, start=5)})"
)
# Spark-side single-digest form of _H32_SPARK (r14, guide §2.3): the
# first 8 hex chars decoded in ONE conv call equal
# slice(1..4)·65536 + slice(5..8) by positional hex arithmetic, so the
# value is bit-identical while computing md5 once per row instead of
# twice (value identity pinned in tests/test_layout.py).
_H32_ONE_SPARK = f"CAST(conv(substring({_SH_MD5}, 1, 8), 16, 10) AS BIGINT)"

def winnow_fp_ctes(docs_rel: str) -> str:
    """CTE chain ``kg, wh, mins, fps, hot, keptfp`` computing DF-capped
    winnowing fingerprints over ``docs_rel(doc_id, l)`` (l = nonempty
    token list). ONE builder consumed by both WINNOW_ORACLE and the
    dedup cascade's candidate tier (ADVICE r11: a selection-rule edit
    here must not silently desync the two)."""
    return f"""kg AS (
  SELECT doc_id, i,
         l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] AS sh,
         len(l) - {_K - 1} AS n_kg
  FROM {docs_rel}, UNNEST(generate_series(1, len(l) - {_K - 1})) AS t(i)
  WHERE len(l) >= {_K}
),
wh AS (
  SELECT doc_id, i, n_kg, CAST({_H32_SQL} AS BIGINT) AS h FROM kg
),
mins AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING) AS fp,
         i, n_kg
  FROM wh
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM mins WHERE i <= n_kg - {_W - 1}
),
hot AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) > {_FP_DF_CAP}
),
keptfp AS (
  SELECT f.doc_id, f.fp FROM fps f
  LEFT JOIN hot h ON f.fp = h.fp
  WHERE h.fp IS NULL
)"""


#: shared candidate-pair CTE over ``keptfp`` — pairs sharing >=
#: _MIN_SHARED surviving fingerprints, with the shared count
WINNOW_PAIRS_CTE = f"""winnow_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::BIGINT AS shared_fps
  FROM keptfp a JOIN keptfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {_MIN_SHARED}
)"""

WINNOW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
{winnow_fp_ctes("toks")},
sizes AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_fp FROM keptfp GROUP BY doc_id
),
{WINNOW_PAIRS_CTE}
SELECT p.doc_a, p.doc_b, p.shared_fps,
       sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
       CAST((p.shared_fps * {_CONT_SCALE})
            // LEAST(sa.n_fp, sb.n_fp) AS BIGINT) AS containment_q
FROM winnow_pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
ORDER BY p.shared_fps DESC, p.doc_a, p.doc_b
LIMIT {_TOP}
"""


def winnow_fingerprints(
    docs: DataFrame, checkpoint_kg: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Spark twin of ``winnow_fp_ctes``: returns ``(kg, keptfp)`` for
    ``docs(doc_id, l)`` — the k-gram relation (doc_id, i, n_kg, sh)
    and the DF-capped fingerprint relation (doc_id, fp), the latter
    checkpointed (it feeds >= 2 consumers in every caller). Pass
    ``checkpoint_kg=True`` when the caller re-reads kg (the cascade's
    verify tier re-shingles from it)."""
    kg = (
        docs.where(F.size("l") >= _K)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("l") - F.lit(_K - 1))
            ).alias("i"),
            "l",
            (F.size("l") - F.lit(_K - 1)).alias("n_kg"),
        )
        .select(
            "doc_id",
            "i",
            "n_kg",
            F.expr(
                "element_at(l, i) || ' ' || element_at(l, i + 1)"
                " || ' ' || element_at(l, i + 2)"
            ).alias("sh"),
        )
        # hash PROJECTED here, not inside the window aggregate (r14,
        # guide §2.1/§2.3): a sliding-frame min re-evaluates its input
        # expression per frame row (~_W md5 calls per k-gram), and the
        # window's exchange would otherwise carry the gram STRING —
        # materializing h moves 8 bytes/row through the shuffle and
        # hashes each gram exactly once (single-digest conv form)
        .withColumn("h", F.expr(_H32_ONE_SPARK))
    )
    if checkpoint_kg:
        kg = kg.localCheckpoint(eager=True)
    wmin = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, _W - 1)
    )
    mins = kg.select(
        "doc_id",
        "i",
        "n_kg",
        F.min("h").over(wmin).alias("fp"),
    )
    fps = (
        mins.where(F.col("i") <= F.col("n_kg") - (_W - 1))
        .select("doc_id", "fp")
        .distinct()
    )
    fps = fps.localCheckpoint(eager=True)
    hot = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") > _FP_DF_CAP
    )
    keptfp = fps.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    keptfp = keptfp.localCheckpoint(eager=True)
    return kg, keptfp


def winnow_candidate_pairs(keptfp: DataFrame) -> DataFrame:
    """Spark twin of WINNOW_PAIRS_CTE: (doc_a, doc_b, shared_fps)."""
    a = keptfp.select(F.col("doc_id").alias("doc_a"), "fp")
    b = keptfp.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .where(F.col("shared_fps") >= _MIN_SHARED)
    )


@register("dedup_winnowing_pairs", WINNOW_ORACLE)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top near-dup pairs by shared winnowing fingerprints:
    (doc_a, doc_b, shared_fps, n_fp_a, n_fp_b, containment_q)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
    )
    _, kept = winnow_fingerprints(docs)
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    pairs = winnow_candidate_pairs(kept)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_fp_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_fp_b"))
    scored = (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("shared_fps").cast("bigint").alias("shared_fps"),
            F.col("n_fp_a").cast("bigint").alias("n_fp_a"),
            F.col("n_fp_b").cast("bigint").alias("n_fp_b"),
            F.expr(
                f"(shared_fps * {_CONT_SCALE})"
                " div least(n_fp_a, n_fp_b)"
            )
            .cast("bigint")
            .alias("containment_q"),
        )
    )
    return scored.orderBy(
        F.col("shared_fps").desc(), "doc_a", "doc_b"
    ).limit(_TOP)


# ---------------------------------------------------------------------------
# Train/val/test split NEAR-DUP leakage audit (r13)
# ---------------------------------------------------------------------------
#
# The near-dup complement of corpus_prep.py's ``split_leakage_audit``
# (which audits EXACT-duplicate md5 fingerprints across splits): a
# near-duplicate pair straddling train and val/test leaks evaluation
# signal even when exact dedup is clean. Splits are assigned portably
# (md5 mod 10 → 8/1/1 train/val/test — the DeterministicLabelMasker
# recipe, partitioning-independent at any scale); the near-dup pair
# source is the winnowing candidate tier (winnow_fp_ctes /
# WINNOW_PAIRS_CTE — one builder with dedup_winnowing_pairs and the
# cascade, so the selection rule cannot desync). Output: pair counts
# and shared-fingerprint mass per unordered split pair — the
# off-diagonal rows are the leak.
#
# 100 TB shape: the split column is a narrow hash projection; the
# only data-scale work is the fingerprint tier already costed by the
# cascade; the audit join moves (doc_id, split) pairs only.

_SPLIT_SQL = (
    "CASE WHEN ({m}) % 10 < 8 THEN 'train' "
    "WHEN ({m}) % 10 = 8 THEN 'val' ELSE 'test' END"
)

SPLIT_NEARDUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l
  FROM documents
),
{winnow_fp_ctes("toks")},
{WINNOW_PAIRS_CTE},
sp AS (
  SELECT doc_id,
         {_SPLIT_SQL.format(m=md5_uniform16_sql("md5(CAST(doc_id AS VARCHAR))"))}
           AS split
  FROM documents
)
SELECT LEAST(sa.split, sb.split) AS split_a,
       GREATEST(sa.split, sb.split) AS split_b,
       COUNT(*)::BIGINT AS n_pairs,
       SUM(p.shared_fps)::BIGINT AS sum_shared_fps
FROM winnow_pairs p
JOIN sp sa ON p.doc_a = sa.doc_id
JOIN sp sb ON p.doc_b = sb.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("split_leakage_neardup_audit", SPLIT_NEARDUP_ORACLE)
def split_leakage_neardup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs per unordered split pair under a portable
    md5 8/1/1 train/val/test assignment: (split_a, split_b, n_pairs,
    sum_shared_fps). Off-diagonal rows (split_a != split_b) are
    evaluation leakage the exact-dedup pass cannot see."""
    from tfm_semisup_spark.operators.layout import md5_uniform16_spark_sql

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
    )
    _, kept = winnow_fingerprints(toks)
    pairs = winnow_candidate_pairs(kept)
    sp = docs.select(
        "doc_id",
        F.expr(
            _SPLIT_SQL.format(
                m=md5_uniform16_spark_sql("md5(CAST(doc_id AS STRING))")
            )
        ).alias("split"),
    )
    sa = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sp_a"))
    sb = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sp_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("sp_a", "sp_b").alias("split_a"),
            F.greatest("sp_a", "sp_b").alias("split_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("shared_fps").cast("bigint").alias("sum_shared_fps"),
        )
        .orderBy("split_a", "split_b")
    )

"""Production dedup cascade: exact → winnowing candidates → exact
Jaccard verify, composed as ONE lineage.

``dedup_cascade_report`` chains the three tiers the way a production
corpus pipeline runs them — cheapest first, each tier only seeing the
previous tier's survivors:

1. EXACT: md5(text) groups; keeper = min doc_id per group (the
   dedup_exact_keepers rule). On this corpus the planted duplicates
   are NEAR-duplicates (Jaccard ≈ 0.99, zero byte-identical pairs),
   so this tier drops nothing here — the stage is still exercised and
   its row pins that fact.
2. CANDIDATES: winnowing fingerprints (queries/winnowing.py
   parameters: word 3-grams, window 4, boilerplate DF cap) over the
   keepers; candidate pairs share >= _MIN_SHARED fingerprint values.
   Blocking only — no verification claim.
3. VERIFY: exact distinct word-3-gram Jaccard computed ONLY for the
   candidate pairs (per-pair set intersection through the candidate
   list), keep >= _CASCADE_JACC_PPM; from each verified pair the
   larger doc_id drops.

Output: one row per stage (stage, n_in, n_pairs, n_dropped, n_out,
dropped_id_sum) — the stage-by-stage reconciliation a pipeline
operator alarms on.

100 TB shape: tier 1 bounds tier 2's work (the whole point of a
cascade): the verify tier's fan-out is Σ over candidate pairs of the
smaller shingle set, never corpus². Verify joins here use raw shingle
strings for exactness (candidates are blocking-bounded); at corpus
scale the strings would be hashed first (the dedup_ngram_jaccard
trade, documented there). All counts and the Jaccard quantization are
exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register
from tfm_semisup_spark.queries.winnowing import (
    WINNOW_PAIRS_CTE,
    winnow_candidate_pairs,
    winnow_fingerprints,
    winnow_fp_ctes,
)

_CASCADE_JACC_PPM = 600_000  # verify threshold (0.6 Jaccard)

# Tier-2 fingerprinting reuses winnowing.py's shared builders
# (winnow_fp_ctes / WINNOW_PAIRS_CTE and their Spark twins) so a
# selection-rule change there cannot desync this cascade's candidate
# tier from dedup_winnowing_pairs (ADVICE r11).
CASCADE_ORACLE = f"""
WITH n0 AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
hashes0 AS (SELECT doc_id, md5(text) AS hh FROM documents),
keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM hashes0 GROUP BY hh
),
exact_drops AS (
  SELECT h.doc_id FROM hashes0 h
  LEFT JOIN keepers k ON h.doc_id = k.doc_id
  WHERE k.doc_id IS NULL
),
kept_docs AS (
  SELECT d.doc_id, list_filter(string_split(d.text, ' '), t -> t <> '') AS l
  FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
),
{winnow_fp_ctes("kept_docs")},
{WINNOW_PAIRS_CTE},
cand AS (SELECT doc_a, doc_b FROM winnow_pairs),
shingle AS (SELECT DISTINCT doc_id, sh FROM kg),
sz AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM shingle GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*)::BIGINT AS i
  FROM cand c
  JOIN shingle a ON a.doc_id = c.doc_a
  JOIN shingle b ON b.doc_id = c.doc_b AND b.sh = a.sh
  GROUP BY c.doc_a, c.doc_b
),
verified AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sz sa ON sa.doc_id = i.doc_a
  JOIN sz sb ON sb.doc_id = i.doc_b
  WHERE (i.i * 1000000) // (sa.n + sb.n - i.i) >= {_CASCADE_JACC_PPM}
),
near_drops AS (SELECT DISTINCT doc_b AS doc_id FROM verified),
counts AS (
  SELECT (SELECT n FROM n0) AS n0,
         (SELECT COUNT(*) FROM exact_drops)::BIGINT AS d_exact,
         (SELECT COALESCE(SUM(doc_id), 0) FROM exact_drops)::BIGINT
           AS dsum_exact,
         (SELECT COUNT(*) FROM keepers)::BIGINT AS n1,
         (SELECT COUNT(*) FROM cand)::BIGINT AS n_cand,
         (SELECT COUNT(*) FROM verified)::BIGINT AS n_ver,
         (SELECT COUNT(*) FROM near_drops)::BIGINT AS d_near,
         (SELECT COALESCE(SUM(doc_id), 0) FROM near_drops)::BIGINT
           AS dsum_near
)
SELECT '1_exact' AS stage, n0 AS n_in, 0::BIGINT AS n_pairs,
       d_exact AS n_dropped, n1 AS n_out, dsum_exact AS dropped_id_sum
FROM counts
UNION ALL
SELECT '2_winnow_candidates', n1, n_cand, 0::BIGINT, n1, 0::BIGINT
FROM counts
UNION ALL
SELECT '3_jaccard_verified', n1, n_ver, d_near, n1 - d_near, dsum_near
FROM counts
"""


@register("dedup_cascade_report", CASCADE_ORACLE)
def dedup_cascade_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage cascade reconciliation: (stage, n_in, n_pairs,
    n_dropped, n_out, dropped_id_sum) for exact → winnowing
    candidates → Jaccard-verified near-dup removal."""
    docs = load_table(spark, sf_dir, "documents")
    hashes0 = docs.select("doc_id", F.md5("text").alias("hh"))
    keepers = hashes0.groupBy("hh").agg(F.min("doc_id").alias("doc_id"))
    keepers = keepers.select("doc_id").localCheckpoint(eager=True)
    kept_docs = docs.join(keepers, "doc_id").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("l"),
    )
    kg, keptfp = winnow_fingerprints(kept_docs, checkpoint_kg=True)
    cand = winnow_candidate_pairs(keptfp).select("doc_a", "doc_b")
    cand = cand.localCheckpoint(eager=True)
    shingle = kg.select("doc_id", "sh").distinct()
    shingle = shingle.localCheckpoint(eager=True)
    sz = shingle.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = shingle.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = shingle.select(F.col("doc_id").alias("db2"), F.col("sh").alias("shb"))
    inter = (
        cand.join(sa, "doc_a")
        .join(
            sb,
            (F.col("doc_b") == F.col("db2")) & (F.col("sh") == F.col("shb")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sza = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    szb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    verified = (
        inter.join(F.broadcast(sza), "doc_a")
        .join(F.broadcast(szb), "doc_b")
        .where(
            F.expr("(i * 1000000) div (n_a + n_b - i)") >= _CASCADE_JACC_PPM
        )
        .select("doc_a", "doc_b")
    )
    # exact-tier drop counts DERIVED from totals (r14, guide §2.4):
    # drops = docs \ keepers, and keepers is min-per-group, so
    # d_exact = n0 - n1 and dsum_exact = Σ all doc_ids − Σ keeper
    # doc_ids — exact set algebra that removes the anti-join and its
    # second md5 scan of the corpus outright (results identical).
    tot = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("bigint").alias("sum_all"),
    )
    keep_tot = keepers.agg(
        F.count(F.lit(1)).cast("bigint").alias("n1"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("bigint").alias("sum_keep"),
    )
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    # n_ver, d_near and dsum_near in ONE pass over the verify subtree
    # (r14, guide §2.4): distinct-doc_b count/sum ARE the near_drops
    # aggregates, so the candidate->intersect->verify chain runs once
    # instead of twice at execution.
    ver_stats = verified.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ver"),
        F.count_distinct(F.col("doc_b")).cast("bigint").alias("d_near"),
        F.coalesce(F.sum_distinct(F.col("doc_b")), F.lit(0))
        .cast("bigint")
        .alias("dsum_near"),
    )
    counts = (
        tot.crossJoin(keep_tot)
        .crossJoin(n_cand.select(F.col("v").alias("n_cand")))
        .crossJoin(ver_stats)
        .select(
            "*",
            (F.col("n0") - F.col("n1")).alias("d_exact"),
            (F.col("sum_all") - F.col("sum_keep")).alias("dsum_exact"),
        )
    )
    # collect the ONE counts row and emit the three report rows as
    # literals (r15, guide §1.2): the previous row1∪row2∪row3 plan
    # referenced the lazy counts subtree three times, so the final
    # action re-evaluated all four scalar aggregates (and their AQE
    # query stages — 23 exec jobs profiled) once per output row; one
    # bounded single-row collect computes them exactly once. Values —
    # and the oracle hash — are identical by construction.
    c = counts.head()
    # every intermediate checkpoint is now consumed — release the
    # blocks eagerly instead of waiting for driver GC (the leaked-
    # checkpoint class; previously the returned plan still referenced
    # them so they could not be freed here)
    from tfm_semisup_spark.operators.lineage import release

    for ckpt in (keepers, kg, keptfp, cand, shingle):
        release(ckpt)
    rows = [
        ("1_exact", c["n0"], 0, c["d_exact"], c["n1"], c["dsum_exact"]),
        ("2_winnow_candidates", c["n1"], c["n_cand"], 0, c["n1"], 0),
        (
            "3_jaccard_verified",
            c["n1"],
            c["n_ver"],
            c["d_near"],
            c["n1"] - c["d_near"],
            c["dsum_near"],
        ),
    ]
    return spark.createDataFrame(
        rows,
        "stage string, n_in bigint, n_pairs bigint, n_dropped bigint, "
        "n_out bigint, dropped_id_sum bigint",
    )

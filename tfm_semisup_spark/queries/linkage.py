"""Record linkage (entity resolution) — Fellegi–Sunter scoring.

The training-data-pipeline operator the dedup tiers don't cover:
dedup asks "are these two records the SAME string/embedding?"; record
linkage asks "do these two records describe the same ENTITY across two
sources with field-level noise?" — the probabilistic framework of
Fellegi & Sunter (JASA 1969), the backbone of census/master-data
linkage systems (and of open-source implementations like splink).

Setup (fully deterministic, portable to DuckDB):
- file A = the customer table as-is;
- file B = a hash-corrupted re-release of the same customers — each
  comparison field is independently corrupted by an md5-keyed mask
  (the ``DeterministicLabelMasker`` convention:
  ``md5_uniform16(md5(key || salt)) % rate``), simulating a second
  source with typos. Ground truth is ``key_a = key_b``.
- blocking key = (nationkey, account-balance dollar) — both fields
  left UNcorrupted, the standard stable-blocking-key assumption. The
  dollar grid is value-bounded (~11k buckets x 25 nations), so block
  occupancy at the tested SFs stays single-digit and candidate-pair
  volume is ~linear in customers; at the 100 TB design point a real
  deployment widens the key (more fields, LSH blocks — the
  dedup-tier machinery) rather than comparing across blocks.
- comparison vector = (mktsegment, last name-digit, 2nd-last
  name-digit); per-field agreement weights are the Fellegi–Sunter
  log-likelihood ratios log2(m/u) / log2((1-m)/(1-u)) for ASSUMED
  (m, u) parameters matching the corruption rates — quantized once in
  Python to integer milli-bits and inlined as literals in BOTH
  dialects, so the pair score is exact integer arithmetic end to end.

Output: the match-score histogram with truth counts — (score,
decision, n_pairs, n_true_match), <= 8 rows (3 binary fields). The
thresholds (match >= 4000 milli-bits, possible >= 0) are the
upper/lower cut structure of the FS decision rule.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.layout import (
    md5_uniform16_spark_sql,
    md5_uniform16_sql,
)
from tfm_semisup_spark.queries import register

# corruption rates (file B) — and the assumed FS parameters derived
# from them: m = P(agree | match) = 1 - corruption rate,
# u = P(agree | non-match) ~ collision probability of the field
_SEG_RATE = 5  # segment corrupted for 1/5 of B rows
_DIG_RATE = 8  # each name digit corrupted for 1/8 of B rows
_M_SEG, _U_SEG = 0.8, 0.2  # 5 roughly-uniform segments
_M_DIG, _U_DIG = 0.875, 0.1  # 10 uniform digits

#: integer milli-bit agreement/disagreement weights, computed ONCE
#: here and inlined as literals in both dialects
_W_SEG_A = round(math.log2(_M_SEG / _U_SEG) * 1000)  # +2000
_W_SEG_D = round(math.log2((1 - _M_SEG) / (1 - _U_SEG)) * 1000)  # -2000
_W_DIG_A = round(math.log2(_M_DIG / _U_DIG) * 1000)  # +3129
_W_DIG_D = round(math.log2((1 - _M_DIG) / (1 - _U_DIG)) * 1000)  # -2848

_T_MATCH = 4000  # upper FS threshold (milli-bits)
_T_POSSIBLE = 0  # lower FS threshold


def _mask(salt: str, rate: int, spark_side: bool) -> str:
    md5 = f"md5(CAST(c_custkey AS STRING) || '-{salt}')"
    u16 = md5_uniform16_spark_sql(md5) if spark_side else md5_uniform16_sql(md5)
    return f"({u16} % {rate} = 0)"


# blocking + comparison field expressions (dialect-portable except
# the integer-division operator: Spark `div`, DuckDB `//` — operands
# positive, so truncation == floor on both)
_DOLLAR = "(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) + 100000) {div} 100"
_D1 = "CAST(substring(c_name, length(c_name), 1) AS INT)"
_D2 = "CAST(substring(c_name, length(c_name) - 1, 1) AS INT)"

_CORRUPT_SEG = "CASE WHEN {m} THEN 'SMUDGED' ELSE seg END"
_CORRUPT_D1 = "CASE WHEN {m} THEN (d1 + 3) % 10 ELSE d1 END"
_CORRUPT_D2 = "CASE WHEN {m} THEN (d2 + 7) % 10 ELSE d2 END"


_SCORE_SQL = f"""
  CAST(CASE WHEN seg = seg_b THEN {_W_SEG_A} ELSE {_W_SEG_D} END
       + CASE WHEN d1 = d1_b THEN {_W_DIG_A} ELSE {_W_DIG_D} END
       + CASE WHEN d2 = d2_b THEN {_W_DIG_A} ELSE {_W_DIG_D} END
       AS BIGINT)
"""

_DECISION_SQL = f"""
  CASE WHEN score >= {_T_MATCH} THEN 'match'
       WHEN score >= {_T_POSSIBLE} THEN 'possible'
       ELSE 'nonmatch' END
"""

LINKAGE_ORACLE = f"""
WITH base AS (
  SELECT c_custkey, c_nationkey AS nat,
         {_DOLLAR.format(div='//')} AS dollar,
         c_mktsegment AS seg, {_D1} AS d1, {_D2} AS d2
  FROM customer
),
a AS (SELECT c_custkey AS key_a, nat, dollar, seg, d1, d2 FROM base),
b AS (
  SELECT c_custkey AS key_b, nat, dollar,
         {_CORRUPT_SEG.format(m=_mask('seg', _SEG_RATE, False))} AS seg_b,
         {_CORRUPT_D1.format(m=_mask('d1', _DIG_RATE, False))} AS d1_b,
         {_CORRUPT_D2.format(m=_mask('d2', _DIG_RATE, False))} AS d2_b
  FROM base
),
scored AS (
  SELECT key_a, key_b, {_SCORE_SQL} AS score
  FROM a JOIN b ON a.nat = b.nat AND a.dollar = b.dollar
)
SELECT score,
       {_DECISION_SQL} AS decision,
       COUNT(*)::BIGINT AS n_pairs,
       SUM(CASE WHEN key_a = key_b THEN 1 ELSE 0 END)::BIGINT
         AS n_true_match
FROM scored
GROUP BY score
"""


@register("record_linkage_fs", LINKAGE_ORACLE)
def record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter record linkage of the customer table against its
    hash-corrupted re-release, blocked on (nation, balance-dollar):
    match-score histogram (score, decision, n_pairs, n_true_match)."""
    customer = load_table(spark, sf_dir, "customer")
    base = customer.select(
        "c_custkey",
        F.col("c_nationkey").alias("nat"),
        F.expr(_DOLLAR.format(div="div")).alias("dollar"),
        F.col("c_mktsegment").alias("seg"),
        F.expr(_D1).alias("d1"),
        F.expr(_D2).alias("d2"),
    )
    a = base.select(
        F.col("c_custkey").alias("key_a"), "nat", "dollar", "seg", "d1", "d2"
    )
    b = base.select(
        F.col("c_custkey").alias("key_b"),
        "nat",
        "dollar",
        F.expr(_CORRUPT_SEG.format(m=_mask("seg", _SEG_RATE, True))).alias(
            "seg_b"
        ),
        F.expr(_CORRUPT_D1.format(m=_mask("d1", _DIG_RATE, True))).alias(
            "d1_b"
        ),
        F.expr(_CORRUPT_D2.format(m=_mask("d2", _DIG_RATE, True))).alias(
            "d2_b"
        ),
    )
    # blocked candidate join: equi on the high-cardinality blocking
    # key — a plain shuffle join whose output is ~linear in customers
    # at bounded block occupancy; no broadcast (both sides fact-scale)
    scored = (
        a.join(b, ["nat", "dollar"])
        .select("key_a", "key_b", F.expr(_SCORE_SQL).alias("score"))
    )
    return (
        scored.groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("key_a") == F.col("key_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_true_match"),
        )
        .select(
            "score",
            F.expr(_DECISION_SQL).alias("decision"),
            "n_pairs",
            "n_true_match",
        )
    )

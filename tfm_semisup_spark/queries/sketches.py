"""Sketch-based approximate aggregates (the 100 TB tier for distinct
counts and quantiles).

Exact COUNT(DISTINCT) shuffles every (group, value) pair; exact
percentiles sort. At corpus scale the right answers are one-pass,
fixed-size, MERGEABLE summaries:

- HyperLogLog++ (`approx_count_distinct`) — ~2% error from a few KB of
  state per group; map-side partials merge associatively, so the
  shuffle moves sketches, not values.
- Datasketches HLL columns (`hll_sketch_agg` / `hll_union_agg`) — the
  sketch itself is a materializable BINARY column, which is what makes
  *incremental* distinct counting possible: persist per-day sketches,
  union them for any rollup window. You cannot sum distinct counts;
  you CAN union sketches (same pattern as operators/rollup_table.py
  for summable aggregates).
- GK quantile summaries (`percentile_approx`) — bounded-error
  percentiles with mergeable partials.

All three are deterministic for a given dataset (hash-based state,
associative merges — verified under 1/7/32-way repartitioning in
tests/test_sketches.py), so rows-only driver checks are stable. The
exact twins stay available as oracle tiers (`conditional_distinct_users`,
the stats battery's exact percentiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.layout import (
    md5_uniform16_spark_sql,
    md5_uniform16_sql,
)
from tfm_semisup_spark.queries import register


@register("sketch_distinct_users_by_type")
def sketch_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type distinct users via HLL++ — the one-pass scale form of
    `conditional_distinct_users` (its exact oracle twin). Accuracy vs
    exact asserted <2% in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .orderBy("event_type")
    )


@register("sketch_value_quantiles")
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p50/p95/p99 of event value via GK summaries
    (`percentile_approx`): bounded-error, mergeable — no per-group
    sort. Accuracy vs exact percentiles asserted in tests.

    Determinism caveat (rows-only contract): GK summary merges are NOT
    guaranteed merge-order-independent (unlike HLL union). The rounded
    output is stable under 1/7/32-way repartition (tested), which
    covers the driver's fixed local parallelism, but a run with
    materially different parallelism could land a rounding boundary
    differently. If the driver ever varies parallelism, demote this
    entry or coarsen the rounding further."""
    ev = load_table(spark, sf_dir, "events")
    q = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(10000)
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(q.getItem(0), 2).alias("p50"),
            F.round(q.getItem(1), 2).alias("p95"),
            F.round(q.getItem(2), 2).alias("p99"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Portable sampled-quantile audit — the ORACLED sibling of
# sketch_value_quantiles (r12 promotion, VERDICT r11 #7)
# ---------------------------------------------------------------------------
#
# GK summaries can't be oracled (merge-order-dependent internal state),
# so this tier makes the same trade as hll_portable_distinct: a
# deterministic approximate-quantile estimator whose math both engines
# reproduce bit-identically. Estimator = exact positional quantiles of
# a portable md5 row sample (keep iff u16(md5(event_id)) % 16 == 0 —
# the textbook uniform-sample quantile sketch, mergeable by sample
# union). Everything is selection and counting — the only arithmetic
# is exact integer rank math (ceil(phi*m) with cleared denominators) —
# so there is no ULP surface anywhere. The audit columns then measure
# the estimator against the FULL data: rank_pXX = exact count of rows
# <= the estimate, making the sampling error a driver-checked number
# instead of a design claim.
#
# Scale: the sample sort is per-type over a 1/16 sample — this is the
# documented AUDIT tier (the ANN brute-force trade); production
# quantiles stay on the GK rows-only tier above. The full-data pass is
# one broadcast join against the 5-row estimate table + one aggregate.

_QSA_MOD = 16  # keep 1/16 of rows

_QSA_RANKS = [
    ("p50", "(m + 1) // 2"),
    ("p95", "(19 * m + 19) // 20"),
    ("p99", "(99 * m + 99) // 100"),
]

QUANTILE_SAMPLE_ORACLE = f"""
WITH s AS (
  SELECT event_type, value, event_id
  FROM events
  WHERE {md5_uniform16_sql("md5(CAST(event_id AS VARCHAR))")} % {_QSA_MOD} = 0
),
r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value NULLS FIRST, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM s
),
est AS (
  SELECT event_type, MAX(m)::BIGINT AS m,
         {", ".join(f"MAX(CASE WHEN rn = {rk} THEN value END) AS {nm}"
                    for nm, rk in _QSA_RANKS)}
  FROM r GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*)::BIGINT AS n,
       MAX(est.m) AS m,
       {", ".join(f"MAX(est.{nm}) AS {nm}_est" for nm, _ in _QSA_RANKS)},
       {", ".join(
           f"SUM(CASE WHEN e.value <= est.{nm} THEN 1 ELSE 0 END)::BIGINT"
           f" AS rank_{nm}" for nm, _ in _QSA_RANKS)}
FROM events e JOIN est ON e.event_type = est.event_type
GROUP BY e.event_type
"""


@register("quantile_sample_audit", QUANTILE_SAMPLE_ORACLE)
def quantile_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable sampled positional quantiles of event value per type,
    audited against the full data: (event_type, n, m, p50/p95/p99_est,
    rank_p50/p95/p99). The quantile-sketch MATH (sample membership,
    rank selection, rank error) is driver-checked; production
    quantiles remain on the GK tier (``sketch_value_quantiles``)."""
    ev = load_table(spark, sf_dir, "events")
    keep = F.expr(
        f"{md5_uniform16_spark_sql('md5(CAST(event_id AS STRING))')}"
        f" % {_QSA_MOD} = 0"
    )
    from pyspark.sql import Window

    # ADVICE r12: NULL position is explicit on BOTH sides (Spark asc =
    # nulls first; DuckDB default asc = NULLS LAST) so a future NULL in
    # events.value cannot silently diverge the sampled ranks.
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_first(), "event_id"
    )
    wm = Window.partitionBy("event_type")
    ranked = (
        ev.where(keep)
        .select("event_type", "value", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("m", F.count(F.lit(1)).over(wm))
    )
    est = ranked.groupBy("event_type").agg(
        F.max("m").cast("bigint").alias("m"),
        *[
            F.max(F.expr(f"CASE WHEN rn = {rk.replace('//', ' div ')} "
                         f"THEN value END")).alias(nm)
            for nm, rk in _QSA_RANKS
        ],
    )
    joined = ev.join(F.broadcast(est), "event_type")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("m").alias("m"),
        *[F.max(nm).alias(f"{nm}_est") for nm, _ in _QSA_RANKS],
        *[
            F.sum(F.when(F.col("value") <= F.col(nm), 1).otherwise(0))
            .cast("bigint")
            .alias(f"rank_{nm}")
            for nm, _ in _QSA_RANKS
        ],
    )


# ---------------------------------------------------------------------------
# Portable KMV (bottom-k) distinct sketch — the ORACLED sibling of
# sketch_distinct_users_by_type (r13 promotion, VERDICT r12 #3)
# ---------------------------------------------------------------------------
#
# HLL internal state can't be oracled, so this tier makes the same
# trade as quantile_sample_audit: a deterministic sketch whose math
# both engines reproduce bit-identically. Estimator = K-minimum-values
# (Bar-Yossef et al. 2002): hash each user to a 48-bit integer (first
# 12 hex chars of md5 — Spark `conv(..,16,10)` == the DuckDB
# slice-multiply chain, parity pinned in tests/test_layout.py for the
# 16-bit primitive and re-proven here by the driver hash itself), keep
# the K smallest DISTINCT hashes per type, estimate
# n ≈ (K-1)·2^48/h_K. Everything is hashing, DISTINCT and rank
# selection — exact integers until ONE final division (identical
# inputs → identical IEEE double on both engines). The audit column
# n_exact makes the sketch error a driver-checked number.
#
# Scale: per-type state is K values (mergeable: union the bottom-k
# sets, re-take bottom-k) — the production path groups ANY cardinality
# into constant memory; the exact n_exact audit column is the bounded
# tier (5 event types). K=8 fits sf0.001's 15 users/type.

_KMV_K = 8
_KMV_SPACE = 1 << 48

# The hash is SALTED with event_type (r14, ADVICE r13): every event
# type contains the identical user population at the gate SFs (15
# users/type at sf0.001, 150 at sf0.01), so an unsalted per-user hash
# made all five bottom-k sets — and therefore all five output rows —
# carry the same h_k/est_users/err_ratio, and the PARTITION BY in the
# rank window was never differentiated by data. Salting makes each
# type's KMV state distinct (pinned by the plan-shapes test).
_KMV_MD5 = "md5(event_type || ':' || CAST(user_id AS VARCHAR))"

_KMV_HASH_DUCK = (
    "((CAST("
    + md5_uniform16_sql(_KMV_MD5, start=1)
    + " AS BIGINT) * 65536 + "
    + md5_uniform16_sql(_KMV_MD5, start=5)
    + ") * 65536 + "
    + md5_uniform16_sql(_KMV_MD5, start=9)
    + ")"
)

KMV_DISTINCT_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT event_type, {_KMV_HASH_DUCK} AS h
  FROM events
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
),
est AS (
  SELECT event_type, MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS h_k
  FROM ranked GROUP BY event_type
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS n_exact
  FROM events GROUP BY event_type
)
SELECT x.event_type, x.n_exact, {_KMV_K}::BIGINT AS k, e.h_k::BIGINT AS h_k,
       ROUND(CAST(({_KMV_K} - 1) AS DOUBLE) * {_KMV_SPACE} / e.h_k, 4)
         AS est_users,
       ROUND(CAST(({_KMV_K} - 1) AS DOUBLE) * {_KMV_SPACE} / e.h_k
             / x.n_exact, 6) AS err_ratio
FROM exact x JOIN est e ON x.event_type = e.event_type
"""


@register("kmv_distinct_users_audit", KMV_DISTINCT_ORACLE)
def kmv_distinct_users_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable KMV (bottom-k) distinct-user sketch per event type,
    audited against the exact count: (event_type, n_exact, k, h_k,
    est_users, err_ratio). The hash is event_type-salted so each
    type's bottom-k state is distinct even though the gate-SF user
    populations coincide (see _KMV_MD5). The SKETCH MATH (hash,
    bottom-k rank, (K-1)·2^48/h_K) is driver-checked; production
    distinct-counting stays on the HLL tier
    (``sketch_distinct_users_by_type``)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    hashed = ev.select(
        "event_type",
        F.expr(
            "CAST(conv(substring("
            "md5(concat(event_type, ':', CAST(user_id AS STRING))),"
            " 1, 12), 16, 10) AS BIGINT)"
        ).alias("h"),
    ).distinct()
    ranked = hashed.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    )
    est = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("h_k")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    est_users = (
        F.lit(float(_KMV_K - 1)) * _KMV_SPACE / F.col("h_k").cast("double")
    )
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type",
        "n_exact",
        F.lit(_KMV_K).cast("bigint").alias("k"),
        F.col("h_k").cast("bigint").alias("h_k"),
        F.round(est_users, 4).alias("est_users"),
        F.round(est_users / F.col("n_exact"), 6).alias("err_ratio"),
    )


@register("sketch_incremental_distinct_users")
def sketch_incremental_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct counting via MATERIALIZABLE sketches: build
    one Datasketches-HLL binary per (event_type, day) — the shape a
    rollup table would persist — then union-merge the per-day sketches
    into per-type totals. This is the only correct way to roll distinct
    counts up across partitions/days (distincts don't sum; sketches
    union), and the per-day partials mean a new day's data touches ONE
    partition of the sketch table, exactly like the summable rollup in
    operators/rollup_table.py.

    Estimates equal the direct whole-table sketch (same sketch state
    either way — union is associative), asserted in tests."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_day_sketches"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------
#
# The frequency member of the sketch tier (HLL = distinct, GK =
# quantiles, bloom = membership, CMS = counts): d x w counters, term
# increments one counter per row at position h_j(term), estimate =
# min_j counter[j][h_j(term)] — always an OVERestimate, within
# eps * total with probability 1 - delta. Mergeable by cell-wise sum,
# which is the whole 100 TB point: per-partition sketches union by
# addition, never shipping term strings.
#
# Portable like the bloom screen: the d = 3 row positions are three
# 4-hex slices of ONE md5(term) digest (w = 65536), so both engines
# build bit-identical sketches and agree on every estimate, including
# the collision overestimates. Verified against exact counts for the
# top exact terms.

CMS_D = 3  # hash rows: md5 hex chars 1-4 / 5-8 / 9-12
CMS_TOP = 10

_CMS_POS = [md5_uniform16_sql("md5(term)", start=1 + 4 * j) for j in range(CMS_D)]
# Spark-side: value-identical single-reference conv decode
_CMS_POS_SPARK = [
    md5_uniform16_spark_sql("md5(term)", start=1 + 4 * j) for j in range(CMS_D)
]

CMS_ORACLE = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
hashed AS (
  SELECT term, {_CMS_POS[0]} AS p0, {_CMS_POS[1]} AS p1, {_CMS_POS[2]} AS p2
  FROM toks
),
c0 AS (SELECT p0 AS p, COUNT(*)::BIGINT AS c FROM hashed GROUP BY p0),
c1 AS (SELECT p1 AS p, COUNT(*)::BIGINT AS c FROM hashed GROUP BY p1),
c2 AS (SELECT p2 AS p, COUNT(*)::BIGINT AS c FROM hashed GROUP BY p2),
exact AS (
  SELECT term, MIN(p0) AS p0, MIN(p1) AS p1, MIN(p2) AS p2,
         COUNT(*)::BIGINT AS exact_count
  FROM hashed GROUP BY term
  ORDER BY COUNT(*) DESC, term LIMIT {CMS_TOP}
)
SELECT e.term, e.exact_count,
       LEAST(c0.c, c1.c, c2.c) AS est_count,
       (LEAST(c0.c, c1.c, c2.c) - e.exact_count)::BIGINT AS overestimate
FROM exact e
JOIN c0 ON c0.p = e.p0
JOIN c1 ON c1.p = e.p1
JOIN c2 ON c2.p = e.p2
ORDER BY e.exact_count DESC, e.term
"""


@register("cms_heavy_hitters", CMS_ORACLE)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top exact terms with their count-min estimates:
    (term, exact_count, est_count, overestimate >= 0). One hashing
    pass persisted as primitives; d counter aggregates; broadcast
    estimate joins."""
    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.operators.lineage import truncate

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
        ).alias("term")
    )
    # hash once: term + three positions from one digest (cheap ints
    # everywhere downstream); persisted for the d+1 consumers
    hashed = toks.select(
        "term",
        F.expr(_CMS_POS_SPARK[0]).alias("p0"),
        F.expr(_CMS_POS_SPARK[1]).alias("p1"),
        F.expr(_CMS_POS_SPARK[2]).alias("p2"),
    ).persist()
    counters = [
        hashed.groupBy(F.col(f"p{j}").alias("p")).agg(
            F.count(F.lit(1)).alias("c")
        )
        for j in range(CMS_D)
    ]
    exact = (
        hashed.groupBy("term")
        .agg(
            F.min("p0").alias("p0"),
            F.min("p1").alias("p1"),
            F.min("p2").alias("p2"),
            F.count(F.lit(1)).alias("exact_count"),
        )
        .orderBy(F.col("exact_count").desc(), "term")
        .limit(CMS_TOP)
    )
    est = exact
    for j, cdf in enumerate(counters):
        est = est.join(
            F.broadcast(cdf.withColumnRenamed("c", f"c{j}")),
            est[f"p{j}"] == cdf["p"],
        ).drop("p")
    out = truncate(
        est.select(
            "term",
            "exact_count",
            F.least("c0", "c1", "c2").alias("est_count"),
            (F.least("c0", "c1", "c2") - F.col("exact_count")).alias(
                "overestimate"
            ),
        ).orderBy(F.col("exact_count").desc(), "term")
    )
    hashed.unpersist()
    return out


# ---------------------------------------------------------------------------
# Portable HyperLogLog — the ORACLED sketch tier
# ---------------------------------------------------------------------------
#
# The HLL++ / Datasketches tiers above are rows-only (engine-native
# hashes). This tier ORACLE-CHECKS the HLL math itself, the same move
# the portable MinHash/SimHash/CMS tiers made for their families:
# both engines derive register updates from the SAME md5 digest, so
# bucket assignment, rank (leading-zero count), register maxima, and
# the harmonic-mean estimate are value-identical — an approximate
# algorithm with an EXACT cross-engine contract.
#
# Arithmetic: bucket = u16(md5[1..4]) % 64 (65536 % 64 == 0 — exactly
# uniform); rank comes from a SECOND independent 16-bit slice via an
# integer-comparison CASE chain (no log2 — a power-of-two w under
# floor(ln(w)/ln(2)) is exactly the cross-engine ULP trap); 2^-r
# terms are exact dyadic doubles and 64 of them need 6+17 mantissa
# bits, so the register sum is EXACT regardless of order — the same
# order-independence argument as the integer EWMA (SCALE.md). The
# only libm call is ln() inside the standard small-range correction,
# rounded away.
#
# 100 TB: the register table is the shuffle payload — 64 rows — after
# a map-side partial MAX; the scan is one pass. Mergeability is the
# defining property (MAX of register vectors), shared with the
# streaming CMS tier. Accuracy is the m=64 textbook 1.04/sqrt(64)
# ≈ 13% (measured 5.6%/4.5%/13.4% at sf0.001/0.01/0.1); the 16-bit
# rank slice saturates around m*2^16 ≈ 4M distinct — production
# cardinalities use the rows-only HLL++ tier above, THIS tier's job
# is proving the register math cross-engine. Both knobs (m, rank
# width) widen by slicing more of the same digest.

_HLL_M = 64
_HLL_ALPHA = 0.709  # standard alpha_64


def _hll_rank_case(w: str) -> str:
    """Leading-zero rank of a 16-bit value, pure integer comparisons:
    w >= 2^15 -> 1, ..., w >= 1 -> 16, w = 0 -> 17. Portable text."""
    cases = " ".join(
        f"WHEN {w} >= {1 << (15 - i)} THEN {i + 1}" for i in range(16)
    )
    return f"(CASE {cases} ELSE 17 END)"


def _hll_select(u16_bucket: str, u16_rank: str) -> str:
    return (
        f"CAST({u16_bucket} % {_HLL_M} AS INT) AS bucket, "
        f"{_hll_rank_case(u16_rank)} AS rank_bits"
    )


def _hll_estimate_sql() -> str:
    """Estimate from (nb, s) = (#nonzero registers, sum 2^-r over
    them): zero registers add 1.0 each; small-range correction when
    E <= 2.5m and zeros exist (Flajolet et al. 2007)."""
    v = f"({_HLL_M} - nb)"
    e_raw = f"({_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / (s + {v}))"
    return (
        f"CASE WHEN {e_raw} <= 2.5 * {_HLL_M} AND {v} > 0 "
        f"THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / {v}) "
        f"ELSE {e_raw} END"
    )


def _hll_oracle() -> str:
    from tfm_semisup_spark.operators.layout import md5_uniform16_sql

    b = md5_uniform16_sql("h", start=1)
    r = md5_uniform16_sql("h", start=5)
    return f"""
WITH keys AS (
  SELECT DISTINCT o_custkey FROM orders
),
hashed AS (
  SELECT md5(CAST(o_custkey AS VARCHAR)) AS h FROM keys
),
slots AS (
  SELECT {_hll_select(b, r)} FROM hashed
),
regs AS (
  SELECT bucket, MAX(rank_bits) AS r FROM slots GROUP BY bucket
),
agg AS (
  SELECT COUNT(*) AS nb, SUM(POWER(2.0, -r)) AS s FROM regs
),
exact AS (SELECT COUNT(*) AS n_exact FROM keys)
SELECT CAST(exact.n_exact AS BIGINT) AS n_exact,
       CAST({_HLL_M} - agg.nb AS BIGINT) AS v_zero,
       ROUND({_hll_estimate_sql()}, 2) AS hll_estimate,
       ROUND(ABS({_hll_estimate_sql()} - exact.n_exact)
             / exact.n_exact, 4) AS rel_err
FROM agg, exact
"""


HLL_PORTABLE_ORACLE = _hll_oracle()


@register("hll_portable_distinct", HLL_PORTABLE_ORACLE)
def hll_portable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable 64-register HyperLogLog over distinct order custkeys:
    (n_exact, v_zero, hll_estimate, rel_err) — the sketch MATH is
    driver-checked, not just its output shape."""
    from tfm_semisup_spark.operators.layout import md5_uniform16_spark_sql

    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select("o_custkey").distinct()
    hashed = keys.select(
        F.md5(F.col("o_custkey").cast("string")).alias("h")
    )
    b = md5_uniform16_spark_sql("h", start=1)
    r = md5_uniform16_spark_sql("h", start=5)
    slots = hashed.selectExpr(
        f"CAST({b} % {_HLL_M} AS INT) AS bucket",
        f"{_hll_rank_case(r)} AS rank_bits",
    )
    regs = slots.groupBy("bucket").agg(F.max("rank_bits").alias("r"))
    agg = regs.agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s"),
    )
    exact = keys.agg(F.count(F.lit(1)).alias("n_exact"))
    est = _hll_estimate_sql()
    return (
        agg.crossJoin(F.broadcast(exact))
        .selectExpr(
            "CAST(n_exact AS BIGINT) AS n_exact",
            f"CAST({_HLL_M} - nb AS BIGINT) AS v_zero",
            f"ROUND({est}, 2) AS hll_estimate",
            f"ROUND(ABS({est} - n_exact) / n_exact, 4) AS rel_err",
        )
    )

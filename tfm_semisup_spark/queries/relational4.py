"""Fourth relational coverage block: statistical aggregates
(stddev/variance/corr/covar), GROUPING markers, array-column
aggregates over embeddings, filtered distinct counts, string functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.functions.vector import l2_norm
from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

# Sample stddev/variance + correlation/covariance (both engines use the
# sample definitions for stddev/var_samp/corr/covar_samp).
STATS_ORACLE = """
SELECT l_returnflag,
       ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
       ROUND(var_samp(l_quantity), 4) AS var_qty,
       ROUND(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
       ROUND(covar_samp(l_extendedprice, l_discount), 4) AS cov_pd
FROM lineitem
GROUP BY l_returnflag
"""


@register("stats_aggregates", STATS_ORACLE)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("cov_pd"),
    )


# GROUPING() markers distinguish "NULL because rolled up" from data
# NULLs in grouping-set outputs.
GROUPING_ORACLE = """
SELECT o_orderstatus,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS is_total,
       COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus)
"""


@register("grouping_markers", GROUPING_ORACLE)
def grouping_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus").agg(
        F.grouping("o_orderstatus").cast("long").alias("is_total"),
        F.count(F.lit(1)).alias("n"),
    ).select("o_orderstatus", "is_total", "n")


# Array-column aggregates: per-label embedding norm statistics (the
# shape of embedding-quality monitoring over a 100 TB vector table).
EMB_NORM_ORACLE = """
SELECT CAST(label AS BIGINT) AS label,
       COUNT(*) AS n,
       ROUND(AVG(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
         AS avg_norm,
       ROUND(MIN(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
         AS min_norm,
       ROUND(MAX(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
         AS max_norm
FROM embeddings
GROUP BY 1
"""


@register("embedding_norm_stats", EMB_NORM_ORACLE)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "norm", l2_norm(F.col("embedding").cast("array<double>"))
    )
    return emb.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("norm"), 4).alias("avg_norm"),
        F.round(F.min("norm"), 4).alias("min_norm"),
        F.round(F.max("norm"), 4).alias("max_norm"),
    )


# Per-dimension embedding standardization stats — the fit half of a
# feature-scaling (z-score) stage over a vector table: one posexplode
# (narrow) then a single dim-keyed aggregate whose cardinality is the
# embedding dimension, never the row count. The transform half is a
# broadcast of these 64 rows back over the corpus.
EMB_STANDARDIZE_ORACLE = """
SELECT CAST(s.i - 1 AS BIGINT) AS dim,
       COUNT(*) AS n,
       ROUND(AVG(embedding[s.i]::DOUBLE), 6) AS mean_v,
       ROUND(STDDEV_SAMP(embedding[s.i]::DOUBLE), 6) AS std_v,
       ROUND(MIN(embedding[s.i]::DOUBLE), 6) AS min_v,
       ROUND(MAX(embedding[s.i]::DOUBLE), 6) AS max_v
FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS s(i)
GROUP BY 1
"""


@register("embedding_standardize_stats", EMB_STANDARDIZE_ORACLE)
def embedding_standardize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std/extrema over the embedding table:
    (dim, n, mean_v, std_v, min_v, max_v) — the StandardScaler-fit
    shape expressed relationally."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    return dims.groupBy(F.col("dim").cast("long").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.round(F.stddev_samp("v"), 6).alias("std_v"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
    )


# Conditional distinct counts (count(DISTINCT x) over a predicate).
COND_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS users_total,
       COUNT(DISTINCT CASE WHEN value > 100 THEN user_id END) AS users_high_value
FROM events
GROUP BY event_type
"""


@register("conditional_distinct_users", COND_DISTINCT_ORACLE)
def conditional_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users_total"),
        F.countDistinct(
            F.when(F.col("value") > 100, F.col("user_id"))
        ).alias("users_high_value"),
    )


# String function battery: trim/case/substring/replace/lpad (SURVEY §2.2
# string ops beyond split/contains).
STRING_FUNCS_ORACLE = """
SELECT c_custkey,
       upper(c_mktsegment) AS seg_upper,
       substr(c_name, 1, 8) AS name_prefix,
       replace(c_mktsegment, 'A', '_') AS seg_replaced,
       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
       length(trim(c_name)) AS name_len
FROM customer
"""


@register("string_function_battery", STRING_FUNCS_ORACLE)
def string_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("_")).alias("seg_replaced"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.length(F.trim(F.col("c_name"))).cast("long").alias("name_len"),
    )


# Embedding covariance slice: the exact upper-triangle covariance of
# the first 8 dimensions — a feature-correlation audit, and the
# cross-engine check of the covariance math the PCA operator targets
# (operators/pca.py accumulates the SAME matrix via quantized integer
# moments; its spectrum entry is rows-only because eigh is not SQL —
# this slice pins the underlying second-moment aggregation against
# DuckDB, the stats_correlation_battery covar precedent).
#
# 100 TB shape: ONE single-pass aggregate over 8 projected columns (36
# covar_pop partials, map-side combined) into a single row, unpivoted
# driver-side to 36 rows — no explode of the embedding array, no
# per-dimension shuffle.
EMB_COV_ORACLE = """
WITH pairs AS (
  SELECT i.i AS i, j.j AS j
  FROM UNNEST(generate_series(1, 8)) AS i(i),
       UNNEST(generate_series(1, 8)) AS j(j)
  WHERE i.i <= j.j
),
v AS (SELECT embedding::DOUBLE[] AS e FROM embeddings)
SELECT CAST(p.i AS BIGINT) AS dim_i,
       CAST(p.j AS BIGINT) AS dim_j,
       ROUND(covar_pop(e[p.i], e[p.j]), 6) AS cov
FROM v, pairs p
GROUP BY p.i, p.j
"""


@register("embedding_covariance_slice", EMB_COV_ORACLE)
def embedding_covariance_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance of embedding dims 1-8: (dim_i, dim_j,
    cov). Single-pass 36-partial aggregate; stack() unpivots the one
    result row."""
    emb = load_table(spark, sf_dir, "embeddings")
    proj = emb.select(
        *[
            F.element_at(F.col("embedding").cast("array<double>"), i).alias(f"c{i}")
            for i in range(1, 9)
        ]
    )
    pairs = [(i, j) for i in range(1, 9) for j in range(i, 9)]
    row = proj.agg(
        *[F.covar_pop(f"c{i}", f"c{j}").alias(f"v_{i}_{j}") for i, j in pairs]
    )
    stack_args = ", ".join(
        f"CAST({i} AS BIGINT), CAST({j} AS BIGINT), v_{i}_{j}" for i, j in pairs
    )
    return row.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (dim_i, dim_j, cov_raw)"
    ).select("dim_i", "dim_j", F.round("cov_raw", 6).alias("cov"))


# ---------------------------------------------------------------------------
# INT8 symmetric-quantization error audit (embedding dims 1-8)
# ---------------------------------------------------------------------------
#
# The audit behind shipping int8 embeddings to an ANN index (the PQ/IVF
# tiers quantize; THIS measures what quantization costs): per dim,
# u = x·127/max|x| is floored onto the integer grid and the in-cell
# remainder e = u − ⌊u⌋ ∈ [0,1) is the error in quantizer steps.
# FLOOR (toward −inf) on both engines — NOT round/cast: DuckDB
# CAST(double AS INT) rounds while Spark truncates, and round() at the
# .5 boundary is the documented HALF_UP hazard; floor has no such
# boundary. Order-free parity: e²·10⁹ is floored to an exact integer
# PER ROW and summed as DECIMAL(38,0)/HUGEINT — the quantize-then-
# derive rule — so the corpus-scale sum has zero summation-order noise
# by construction; the single division happens once per dim.
# Two passes by necessity (max|x| feeds the quantizer), each a
# single-row aggregate broadcast forward. The oracle squares as e*e,
# NOT POWER(e,2) (ADVICE r8 #3): pow() carries no correct-rounding
# guarantee, and a 1-ULP divergence flips the floored 1e9 grid
# cross-engine; multiply is IEEE-correctly-rounded on both engines.

_QUANT_DIMS = 8

QUANT_ERR_ORACLE = f"""
WITH proj AS (
  SELECT {", ".join(f"CAST(embedding[{i}] AS DOUBLE) AS c{i}" for i in range(1, _QUANT_DIMS + 1))}
  FROM embeddings
),
mx AS (
  SELECT {", ".join(f"MAX(ABS(c{i})) AS m{i}" for i in range(1, _QUANT_DIMS + 1))}
  FROM proj
),
err AS (
  SELECT COUNT(*)::BIGINT AS n,
         {", ".join(
             f"SUM(CAST(FLOOR((c{i} * 127 / m{i} - FLOOR(c{i} * 127 / m{i})) * (c{i} * 127 / m{i} - FLOOR(c{i} * 127 / m{i})) * 1e9) AS HUGEINT)) AS s{i}"
             for i in range(1, _QUANT_DIMS + 1)
         )},
         {", ".join(f"MAX(m{i}) AS m{i}" for i in range(1, _QUANT_DIMS + 1))}
  FROM proj CROSS JOIN mx
)
SELECT * FROM (
  {" UNION ALL ".join(
      f"SELECT CAST({i} AS BIGINT) AS dim, n AS n_vecs, "
      f"ROUND(m{i}, 6) AS max_abs, "
      f"ROUND(CAST(s{i} AS DOUBLE) / n / 1e9, 6) AS mse_qsteps FROM err"
      for i in range(1, _QUANT_DIMS + 1)
  )}
)
"""


@register("embedding_int8_quant_error", QUANT_ERR_ORACLE)
def embedding_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization error per embedding dim 1-{d}:
    (dim, n_vecs, max_abs, mse_qsteps) — mean squared in-cell remainder
    in quantizer-step² units, exact integer partials.""".format(d=_QUANT_DIMS)
    emb = load_table(spark, sf_dir, "embeddings")
    proj = emb.select(
        *[
            F.element_at(F.col("embedding").cast("array<double>"), i).alias(
                f"c{i}"
            )
            for i in range(1, _QUANT_DIMS + 1)
        ]
    )
    mx = proj.agg(
        *[
            F.max(F.abs(F.col(f"c{i}"))).alias(f"m{i}")
            for i in range(1, _QUANT_DIMS + 1)
        ]
    )
    def _s(i: int):
        u = F.col(f"c{i}") * 127 / F.col(f"m{i}")
        e = u - F.floor(u)
        return F.sum(
            F.floor(e * e * F.lit(1e9)).cast("decimal(38,0)")
        ).alias(f"s{i}")

    err = (
        proj.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            *[_s(i) for i in range(1, _QUANT_DIMS + 1)],
            *[
                F.max(f"m{i}").alias(f"mm{i}")
                for i in range(1, _QUANT_DIMS + 1)
            ],
        )
    )
    stack_args = ", ".join(
        f"CAST({i} AS BIGINT), n, ROUND(mm{i}, 6), "
        f"ROUND(CAST(s{i} AS DOUBLE) / n / 1e9, 6)"
        for i in range(1, _QUANT_DIMS + 1)
    )
    return err.selectExpr(
        f"stack({_QUANT_DIMS}, {stack_args}) AS (dim, n_vecs, max_abs, mse_qsteps)"
    )


# ---------------------------------------------------------------------------
# Embedding pair-distance histogram (collapse / anisotropy audit)
# ---------------------------------------------------------------------------
#
# The corpus-level "is my embedding space healthy" check: the
# distribution of cosine similarity over a deterministic pseudo-random
# pairing (partner(v) = (v·7919 + 13) mod N over the dense id space —
# one pair per vector, N pairs total, no all-pairs anywhere). A
# collapsed encoder shifts the whole histogram toward 1; anisotropy
# shows as a right-heavy bulk.
#
# Parity/codegen discipline: cosine_paired with per-side precomputed
# norms (the VERDICT r7 #1 shape — the fused join stage holds only the
# dot; both engines' dot folds left-to-right by index, so the double
# is bit-identical to DuckDB's list_inner_product form, evidence:
# similarity_pairs_above / dedup_embedding_cosine_pairs driver-green).
# Binning floors the ROUND-6 cosine — both engines bin the identical
# rounded double, so a bin can never flip. Two earlier cuts of this
# query are cautionary tales (ROADMAP batch 16): an exact
# integer-quantized dot emitted 2×dim element_at+floor terms fused
# with the join — janino 64 KB overflow (caught by
# DRIVER_SIM_STRICT_CODEGEN) — and the same dot over 64 pre-projected
# columns OOM'd the driver JIT-compiling the giant generated class.
# The flat-double + precomputed-norm shape is both correct AND the one
# that compiles small.

_PDH_BINS = 20

PDH_ORACLE = """
WITH n AS (SELECT COUNT(*)::BIGINT AS n_vecs FROM embeddings),
v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nrm
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS va, (a.vec_id * 7919 + 13) % t.n_vecs AS vb
  FROM v a CROSS JOIN n t
  WHERE (a.vec_id * 7919 + 13) % t.n_vecs <> a.vec_id
),
scored AS (
  SELECT ROUND(list_inner_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS c
  FROM pairs p
  JOIN v x ON p.va = x.vec_id
  JOIN v y ON p.vb = y.vec_id
)
SELECT LEAST({bins_m1}, CAST(FLOOR((c + 1.0) * 10) AS INT)) AS bin,
       COUNT(*)::BIGINT AS n_pairs,
       MIN(c) AS min_cos,
       MAX(c) AS max_cos
FROM scored
GROUP BY 1
""".format(bins_m1=_PDH_BINS - 1)


@register("embedding_pair_distance_histogram", PDH_ORACLE)
def embedding_pair_distance_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cosine histogram over the deterministic pseudo-random pairing:
    (bin, n_pairs, min_cos, max_cos) — 20 bins on [-1, 1], binned on
    the round-6 cosine so both engines bin identical doubles."""
    from tfm_semisup_spark.functions.vector import cosine_paired, l2_norm_fixed
    from tfm_semisup_spark.io import embedding_dim

    dim = embedding_dim(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = F.broadcast(emb.agg(F.count(F.lit(1)).alias("n_vecs")))
    a = (
        emb.select(
            F.col("vec_id").alias("va"),
            F.col("v").alias("pa"),
            l2_norm_fixed("v", dim).alias("na"),
        )
        .crossJoin(n)
        .withColumn("vb", (F.col("va") * 7919 + 13) % F.col("n_vecs"))
        .where(F.col("vb") != F.col("va"))
    )
    b = emb.select(
        F.col("vec_id").alias("vb"),
        F.col("v").alias("pb"),
        l2_norm_fixed("v", dim).alias("nb"),
    )
    c = F.round(cosine_paired("pa", "pb", "na", "nb", dim), 6)
    scored = a.join(b, "vb").select(c.alias("c"))
    bin_col = F.least(
        F.lit(_PDH_BINS - 1), F.floor((F.col("c") + 1.0) * 10).cast("int")
    )
    return scored.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min("c").alias("min_cos"),
        F.max("c").alias("max_cos"),
    )

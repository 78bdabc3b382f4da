"""Corpus preparation operators for LLM training-data pipelines
(extension surface): document chunking with overlap, token-budget
sequence packing, deterministic stratified sampling.

All three are fully columnar (split/slice/sequence/window — no Python)
and scale-safe: chunking is a narrow per-row explode; packing windows
are PARTITIONED by a doc_id bucket (never a global sort); sampling is a
stateless hash filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.layout import (
    md5_uniform16_spark_sql,
    md5_uniform16_sql,
    shard_bucket_spark_sql,
    shard_bucket_sql,
)
from tfm_semisup_spark.queries import register

CHUNK_TOKENS = 60
CHUNK_STEP = 45  # 15-token overlap between consecutive chunks

CHUNKS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
),
starts AS (
  SELECT doc_id, w, CAST(s AS BIGINT) AS s
  FROM toks, UNNEST(generate_series(1, len(w), {CHUNK_STEP})) AS t(s)
  WHERE len(w) > 0
)
SELECT doc_id,
       CAST((s - 1) / {CHUNK_STEP} AS BIGINT) AS chunk_id,
       CAST(len(list_slice(w, s, s + {CHUNK_TOKENS - 1})) AS BIGINT) AS n_tokens,
       md5(array_to_string(list_slice(w, s, s + {CHUNK_TOKENS - 1}), ' ')) AS chunk_fp
FROM starts
"""


@register("doc_chunks_overlap", CHUNKS_ORACLE)
def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding word-window chunking ({CHUNK_TOKENS} tokens, step
    {CHUNK_STEP}) — the standard long-document -> training-sequence
    split. Narrow per-row explode, no shuffle; chunk text is emitted as
    an md5 fingerprint so the compare (and a real pipeline's dedup
    join) moves hashes, not text."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda t: t != "")
    chunked = (
        docs.select("doc_id", words.alias("w"))
        .where(F.size("w") > 0)
        # 0-based starts: 0, step, 2*step, ... < n_words
        .select(
            "doc_id",
            "w",
            F.posexplode(
                F.sequence(F.lit(0), F.size("w") - 1, F.lit(CHUNK_STEP))
            ).alias("chunk_id", "start"),
        )
    )
    chunk = F.slice(F.col("w"), F.col("start") + 1, CHUNK_TOKENS)
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )


CTX_TOKENS = 256
N_BUCKETS = 32

PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         doc_id % {N_BUCKETS} AS bucket,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
           AS n_tokens
  FROM documents
),
packed AS (
  SELECT bucket, doc_id, n_tokens,
         CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                    / {CTX_TOKENS}) AS BIGINT) AS bin
  FROM toks
)
SELECT bucket, bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM packed
GROUP BY bucket, bin
"""


@register("pack_token_bins", PACK_ORACLE)
def pack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign docs (in deterministic
    doc_id order) to ~{CTX_TOKENS}-token bins via the cumulative-sum
    bin id floor(cum_before / ctx). Docs may straddle a bin boundary —
    the streaming-concat packing used by most LLM data loaders, not
    strict first-fit (which is inherently sequential). The window is
    PARTITIONED by a doc_id bucket: each bucket packs independently,
    so no global sort exists at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % N_BUCKETS).alias("bucket"),
        F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        .cast("long")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / CTX_TOKENS),
    )
    return packed.groupBy("bucket", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )


# Per-language sampling rates: downsample the high-resource languages,
# keep everything else (the standard corpus-mixing move).
SAMPLE_RATES = {"en": 0.5, "zh": 0.7}
# keep thresholds over the uniform [0, 65536) md5 decode
_SAMPLE_THRESHOLDS = {lang: int(r * 65536) for lang, r in SAMPLE_RATES.items()}


def _stratified_threshold_sql() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {thr}" for lang, thr in _SAMPLE_THRESHOLDS.items()
    )
    return f"CASE lang {cases} ELSE 65536 END"


_STRAT_H_SQL = md5_uniform16_sql("md5(CAST(doc_id AS STRING))")
# Spark evaluates the value-identical single-reference conv form; the
# oracle keeps the portable CASE chain (DuckDB has no conv).
_STRAT_H_SPARK = md5_uniform16_spark_sql("md5(CAST(doc_id AS STRING))")

STRATIFIED_ORACLE = f"""
WITH scored AS (
  SELECT lang,
         {_STRAT_H_SQL} AS h,
         {_stratified_threshold_sql()} AS thr
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN h < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM scored
GROUP BY lang
"""


@register("corpus_stratified_sample", STRATIFIED_ORACLE)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling: doc kept iff the
    uniform [0, 65536) decode of md5(doc_id) falls under the
    language's threshold — a content-keyed hash filter, so membership
    is stable across reruns, partitionings and cluster sizes (no RNG
    state). FULLY ORACLED since r4: the sampler key moved from
    xxhash64 (no DuckDB equivalent — it was the suite's only
    rows-only sampler) to the shared md5 4-hex decode
    (operators/layout.py::md5_uniform16_sql), the same expression text
    both engines evaluate. Returns per-language kept/total pinning
    exact counts."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_STRAT_H_SPARK)
    thr = F.expr(_stratified_threshold_sql())
    return (
        docs.select("lang", (h < thr).alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        )
    )


# Domain-mix resampling: per-source keep rates in sixteenths, keyed by
# a hex digit of md5(doc_id) — md5 is bit-identical in Spark and DuckDB,
# so like the stratified sampler above this one is FULLY ORACLED.
# rate16(srcK) = 16 - 4*(K % 4)  ->  {16, 12, 8, 4}/16 keep rates.
DOMAIN_MIX_ORACLE = """
WITH scored AS (
  SELECT source,
         ascii(substring(md5(CAST(doc_id AS STRING)), 1, 1)) AS a,
         16 - 4 * (CAST(substring(source, 4) AS INT) % 4) AS rate16
  FROM documents
),
flagged AS (
  SELECT source, rate16,
         CASE WHEN (CASE WHEN a <= 57 THEN a - 48 ELSE a - 87 END) < rate16
              THEN 1 ELSE 0 END AS kept
  FROM scored
)
SELECT source,
       COUNT(*)::BIGINT AS n_total,
       SUM(kept)::BIGINT AS n_kept,
       ROUND(MIN(rate16) / 16.0, 4) AS target_rate
FROM flagged
GROUP BY source
ORDER BY source
"""


@register("domain_mix_sample", DOMAIN_MIX_ORACLE)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain mixing (The Pile / DoReMi-style static
    source weights): keep each doc iff its md5 hex-digit bucket falls
    under the source's target rate. Content-keyed — membership is
    stable across reruns, partitionings and cluster sizes — and a pure
    narrow filter at scan speed; the only shuffle is the tiny
    per-source audit aggregate emitted here."""
    docs = load_table(spark, sf_dir, "documents")
    # Single-reference hex decode (VERDICT r4 #4): conv(hex,16,10)
    # names the md5 ONCE per row where the when/otherwise CASE decode
    # inlined it into condition + branch (measured 25% faster at
    # sf0.1, bit-identical values). The DuckDB oracle keeps its CASE
    # form — the driver compares values, not expression text.
    bucket16 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    rate16 = 16 - 4 * (F.substring("source", 4, 10).cast("int") % 4)
    return (
        docs.select(
            "source",
            rate16.alias("rate16"),
            (bucket16 < rate16).cast("int").alias("kept"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
            F.round(F.min("rate16") / 16.0, 4).alias("target_rate"),
        )
        .orderBy("source")
    )


@register("pack_first_fit_bins")
def pack_first_fit_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict first-fit packing summary (rows-only: the corpus-scale
    sequential per-bucket pass is not SQL-expressible; determinism
    from hash buckets + id order). Invariants proven in
    tests/test_packing.py; the state-machine MATH is oracle-checked by
    the bounded-slice sibling ``pack_strict_replay_audit`` (r14)."""
    from tfm_semisup_spark.operators.packing import pack_first_fit

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_first_fit(docs, ctx_tokens=CTX_TOKENS, n_buckets=N_BUCKETS)
    return packed.groupBy("pack_bucket", "pack_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


# Strict-packing replay audit (r14): the sequential next-fit state
# machine inside operators/packing.py::pack_first_fit — the last
# imperative per-partition state carry with no oracled sibling — is
# replayed EXACTLY by a DuckDB recursive CTE over a bounded
# deterministic slice (the {PACK_AUDIT_DOCS} smallest doc_ids;
# TakeOrderedAndProject, constant work at any SF — the recursion depth
# is bounded by the slice, never by the corpus). The bucket is the
# shared portable md5 decode (identical values on both engines), so
# the Spark side runs the REAL Arrow mapInPandas operator and the
# oracle independently steps the same (bin, fill) transitions one row
# at a time. Non-vacuity measured: 64 rows at every SF; bins per
# 4-bucket slice 36/37/42 at sf0.001/0.01/0.1 with 24/21/18 multi-doc
# bins (ctx=128 vs ~55 avg tokens — real fill/overflow transitions,
# not one-doc-per-bin degeneracy). The oversized-doc branch (no gate-SF
# doc exceeds 128 tokens) is pinned by the synthetic-data Python
# reference test instead (tests/test_packing.py).
PACK_AUDIT_DOCS = 64
PACK_AUDIT_BUCKETS = 4
PACK_AUDIT_CTX = 128

_PACK_AUDIT_BUCKET = shard_bucket_sql(
    "md5(CAST(doc_id AS STRING))", PACK_AUDIT_BUCKETS
)

PACK_REPLAY_ORACLE = f"""
WITH RECURSIVE sliced AS (
  SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT {PACK_AUDIT_DOCS}
),
ordered AS (
  SELECT doc_id,
         {_PACK_AUDIT_BUCKET} AS pack_bucket,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY {_PACK_AUDIT_BUCKET} ORDER BY doc_id) AS rn
  FROM sliced
),
replay AS (
  SELECT pack_bucket, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS pack_bin, n_tokens AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.pack_bucket, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN r.fill > 0 AND r.fill + o.n_tokens > {PACK_AUDIT_CTX}
              THEN r.pack_bin + 1 ELSE r.pack_bin END,
         CASE WHEN r.fill > 0 AND r.fill + o.n_tokens > {PACK_AUDIT_CTX}
              THEN o.n_tokens ELSE r.fill + o.n_tokens END
  FROM replay r
  JOIN ordered o ON o.pack_bucket = r.pack_bucket AND o.rn = r.rn + 1
)
SELECT doc_id, pack_bucket, pack_bin, n_tokens FROM replay
"""


@register("pack_strict_replay_audit", PACK_REPLAY_ORACLE)
def pack_strict_replay_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bin assignments of the REAL strict-packing operator
    (Arrow mapInPandas sequential state) on a bounded deterministic
    slice, hash-checked against a DuckDB recursive-CTE replay of the
    same next-fit transitions — the oracled sibling that closes the
    packing family's imperative-state verification gap (the
    ``pack_first_fit_bins`` production entry stays rows-only)."""
    from tfm_semisup_spark.operators.packing import pack_first_fit

    docs = load_table(spark, sf_dir, "documents")
    sliced = (
        docs.orderBy("doc_id")
        .limit(PACK_AUDIT_DOCS)
        .select(
            "doc_id",
            "text",
            F.expr(
                shard_bucket_spark_sql(
                    "md5(CAST(doc_id AS STRING))", PACK_AUDIT_BUCKETS
                )
            ).alias("audit_bucket"),
        )
    )
    packed = pack_first_fit(
        sliced, ctx_tokens=PACK_AUDIT_CTX, bucket_col="audit_bucket"
    )
    return packed.select("doc_id", "pack_bucket", "pack_bin", "n_tokens")


# Deterministic global training shuffle -> shard assignment. A real
# training run needs documents in a reproducible pseudo-random order
# split into fixed shards; the content-keyed answer is hash ordering:
# shard = md5-bucket of the id (UNIFORM 4-hex-char decode —
# operators/layout.py::shard_bucket_sql; the r1-r3 raw-ascii formula
# was 3x-skewed, ADVICE r3), position = rank of the md5 WITHIN the
# shard. Same md5-portability trick as domain_mix_sample — bit
# identical in Spark and DuckDB, so the whole op is oracled; Spark,
# DuckDB and the physical writer all evaluate the IDENTICAL
# expression text.
SHARD_COUNT = 8

_SHARD_EXPR = shard_bucket_sql("md5(CAST(doc_id AS STRING))", SHARD_COUNT)
_SHARD_SPARK = shard_bucket_spark_sql(
    "md5(CAST(doc_id AS STRING))", SHARD_COUNT
)

TRAINING_SHARDS_ORACLE = f"""
SELECT doc_id,
       {_SHARD_EXPR} AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY {_SHARD_EXPR}
         ORDER BY md5(CAST(doc_id AS STRING)), doc_id
       ) AS BIGINT) AS pos
FROM documents
"""


@register("training_shard_assignment", TRAINING_SHARDS_ORACLE)
def training_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shard, pos): reproducible global shuffle of the corpus
    into SHARD_COUNT training shards — shard by md5 bucket, position by
    md5 order within the shard (ties impossible past the doc_id
    tiebreak).

    Scale shape: ONE hash exchange on shard + per-shard sort (the
    row_number window is PARTITIONED — never a single-partition global
    sort); at 100 TB this is exactly the write path of
    `repartition(shard).sortWithinPartitions(hash)` that produces
    ready-to-stream training shards, expressed as a checkable query.
    Content-keyed: order is identical across reruns, partitionings and
    cluster sizes."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.expr(_SHARD_SPARK)
    w = Window.partitionBy("shard").orderBy("__h", "doc_id")
    return (
        docs.select("doc_id", h.alias("__h"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


# ---------------------------------------------------------------------------
# Deterministic weighted reservoir sample (A-Res)
# ---------------------------------------------------------------------------
#
# Efraimidis & Spirakis (2006) reservoir sampling: each item draws
# u ~ Uniform(0,1] and the k items with the LARGEST u^(1/w) form an
# exact weighted-without-replacement sample. Ordering by u^(1/w) is
# ordering by ln(u)/w, which avoids the pow() call; u derives from the
# shared portable md5 4-hex decode so both engines draw the SAME
# uniforms and select the SAME sample — a seeded, partitioning-
# independent weighted sampler (Spark's own df.sample has no weights
# and rdd-level samplers are partitioning-sensitive).
#
# Scale shape: the key is one narrow projection; top-k by key is
# TakeOrderedAndProject — per-partition heaps then a k-row driver
# merge, no global sort, no shuffle of the corpus. The key is rounded
# (9 dp, far below any real key gap) on BOTH engines before ordering
# so libm's last-ulp ln() differences cannot reorder the boundary;
# doc_id breaks exact ties deterministically.

WRS_K = 25
_WRS_H = md5_uniform16_sql("md5(CAST(doc_id AS STRING) || '#wrs')")
# weight = n_chars: longer documents proportionally likelier.
_WRS_KEY = f"round(ln((({_WRS_H}) + 1) / 65537.0) / n_chars, 9)"
_WRS_H_SPARK = md5_uniform16_spark_sql("md5(CAST(doc_id AS STRING) || '#wrs')")
_WRS_KEY_SPARK = f"round(ln((({_WRS_H_SPARK}) + 1) / 65537.0) / n_chars, 9)"

WEIGHTED_RESERVOIR_ORACLE = f"""
SELECT doc_id, lang, source, n_chars,
       {_WRS_KEY} AS sample_key
FROM documents
ORDER BY sample_key DESC, doc_id
LIMIT {WRS_K}
"""


@register("weighted_reservoir_sample", WEIGHTED_RESERVOIR_ORACLE)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-WRS_K weighted sample of documents by n_chars via A-Res
    keys. Plan: narrow key projection -> TakeOrderedAndProject (local
    heaps + k-row merge)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.expr(_WRS_KEY_SPARK).alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(WRS_K)
    )


# Per-GROUP weighted reservoir (balanced eval-set construction): the
# same A-Res keys as weighted_reservoir_sample, but top-k WITHIN each
# language — the shape that builds a per-language-balanced eval or
# annotation batch from a skewed corpus. Plan: one narrow key
# projection, ONE lang exchange, per-group rank (never a global sort);
# at 100 TB each group's top-k is a partitioned window over its own
# rows.
WRS_GROUP_K = 5

WRS_PER_LANG_ORACLE = f"""
SELECT lang, doc_id, n_chars, sample_key, CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT lang, doc_id, n_chars,
         {_WRS_KEY} AS sample_key,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {_WRS_KEY} DESC, doc_id) AS rnk
  FROM documents
)
WHERE rnk <= {WRS_GROUP_K}
"""


@register("weighted_reservoir_per_lang", WRS_PER_LANG_ORACLE)
def weighted_reservoir_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-WRS_GROUP_K weighted sample per language:
    (lang, doc_id, n_chars, sample_key, rank)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        F.expr(_WRS_KEY_SPARK).alias("sample_key"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("sample_key"), "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= WRS_GROUP_K)
    )


# Temperature-based domain mixing (alpha = 0.5): the multilingual-LLM
# data recipe where source s contributes mass proportional to
# n_s^alpha instead of n_s — small sources are upweighted, huge ones
# downsampled (the "sampling temperature" of mBERT/XLM-R/mT5 recipes;
# domain_mix_sample above is the FIXED-rate cousin). Per-source keep
# rate = min(1, 2/sqrt(n_s)) so expected kept mass is ~2*sqrt(n_s).
#
# Cross-engine exactness by construction: the keep decision compares
# the shared 4-hex md5 uniform (u in [0, 65536)) against an INTEGER
# threshold floor(65536 * 2/sqrt(n)). IEEE-754 requires sqrt and
# division to be correctly rounded and 65536 scaling is a power-of-two
# exponent shift, so the threshold double is bit-identical in Spark
# and DuckDB and FLOOR cannot diverge — no ULP boundary anywhere
# (the reason this uses alpha=1/2 specifically: pow() carries no
# correct-rounding guarantee, sqrt does).
#
# 100 TB shape: one wordcount-sized groupBy for the per-source counts
# (|sources| rows, broadcast back), then a narrow per-row keep flag —
# no window, no per-doc shuffle beyond the final per-source aggregate.
_TEMP_H = md5_uniform16_sql("md5(CAST(doc_id AS STRING) || '#temp')")
_TEMP_H_SPARK = md5_uniform16_spark_sql("md5(CAST(doc_id AS STRING) || '#temp')")

DOMAIN_TEMPERATURE_ORACLE = f"""
WITH c AS (
  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
),
s AS (
  SELECT d.source, d.doc_id,
         {_TEMP_H} AS u,
         LEAST(65536, CAST(FLOOR(65536.0 * 2.0 / SQRT(c.n_src)) AS BIGINT)) AS thr
  FROM documents d JOIN c USING (source)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN u < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(MIN(thr) AS BIGINT) AS rate_64k,
       CAST(SUM(CASE WHEN u < thr THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
FROM s
GROUP BY source
"""


@register("domain_temperature_sample", DOMAIN_TEMPERATURE_ORACLE)
def domain_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) source resampling: per-source keep rate
    min(1, 2/sqrt(n_s)) applied as a deterministic md5-threshold —
    kept mass ends up proportional to sqrt(source size). Output
    (source, n_total, n_kept, rate_64k, kept_id_sum); rate_64k is the
    integer threshold in 65536ths, kept_id_sum pins the kept SET."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    thr = F.least(
        F.lit(65536).cast("long"),
        F.floor(F.lit(65536.0) * F.lit(2.0) / F.sqrt(F.col("n_src"))).cast("long"),
    )
    flagged = (
        docs.join(F.broadcast(counts), "source")
        .withColumn("u", F.expr(_TEMP_H_SPARK).cast("long"))
        .withColumn("thr", thr)
        .withColumn("kept", (F.col("u") < F.col("thr")).cast("long"))
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.min("thr").cast("bigint").alias("rate_64k"),
        F.sum(F.col("doc_id") * F.col("kept")).cast("bigint").alias("kept_id_sum"),
    )


# ---------------------------------------------------------------------------
# Train/val/test split with cross-split leakage audit
# ---------------------------------------------------------------------------
#
# The governance check every training-data pipeline needs before a
# model sees the splits: assign documents to train/val/test by a
# deterministic portable hash (80/10/10 of the uniform [0,65536)
# md5 decode) and audit whether any EXACT-DUPLICATE text (md5
# fingerprint) spans two splits — duplicate leakage across the
# held-out boundary silently inflates eval metrics.
#
# 100 TB shape: split assignment is stateless per row; the audit is a
# fingerprint groupBy (the exact-dedup shuffle) counting distinct
# splits per fingerprint — one wide-ish aggregate, no pairs.

_SPLIT_H_SQL = md5_uniform16_sql("md5(CAST(doc_id AS STRING))")
_SPLIT_H_SPARK = md5_uniform16_spark_sql("md5(CAST(doc_id AS STRING))")
# 80/10/10 on the uniform 16-bit decode: [0, 52428) / [52428, 58982) / rest
_SPLIT_CASE_SQL = (
    f"CASE WHEN {_SPLIT_H_SQL} < 52428 THEN 'train' "
    f"WHEN {_SPLIT_H_SQL} < 58982 THEN 'val' ELSE 'test' END"
)
_SPLIT_CASE_SPARK = (
    f"CASE WHEN {_SPLIT_H_SPARK} < 52428 THEN 'train' "
    f"WHEN {_SPLIT_H_SPARK} < 58982 THEN 'val' ELSE 'test' END"
)

SPLIT_LEAKAGE_ORACLE = f"""
WITH assigned AS (
  SELECT doc_id, md5(text) AS fp, {_SPLIT_CASE_SQL} AS split
  FROM documents WHERE text IS NOT NULL
),
per_split AS (
  SELECT split, COUNT(*)::BIGINT AS n_docs,
         COUNT(DISTINCT fp)::BIGINT AS n_distinct_texts
  FROM assigned GROUP BY split
),
leaks AS (
  SELECT fp, COUNT(DISTINCT split) AS n_splits, COUNT(*) AS n_copies
  FROM assigned GROUP BY fp HAVING COUNT(DISTINCT split) > 1
),
leak_tot AS (
  SELECT COUNT(*)::BIGINT AS leaked_fingerprints,
         COALESCE(SUM(n_copies), 0)::BIGINT AS leaked_docs
  FROM leaks
)
SELECT split, n_docs, n_distinct_texts,
       (SELECT leaked_fingerprints FROM leak_tot) AS leaked_fingerprints,
       (SELECT leaked_docs FROM leak_tot) AS leaked_docs
FROM per_split
"""


@register("split_leakage_audit", SPLIT_LEAKAGE_ORACLE)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 hash split + exact-duplicate cross-split leakage audit:
    (split, n_docs, n_distinct_texts, leaked_fingerprints,
    leaked_docs) — the leak columns repeat the corpus-level totals on
    each row."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    assigned = docs.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.expr(_SPLIT_CASE_SPARK).alias("split"),
    )
    per_split = assigned.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("fp").cast("bigint").alias("n_distinct_texts"),
    )
    leaks = (
        assigned.groupBy("fp")
        .agg(
            F.countDistinct("split").alias("n_splits"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_splits") > 1)
    )
    leak_tot = leaks.agg(
        F.count(F.lit(1)).cast("bigint").alias("leaked_fingerprints"),
        F.coalesce(F.sum("n_copies"), F.lit(0))
        .cast("bigint")
        .alias("leaked_docs"),
    )
    return per_split.crossJoin(F.broadcast(leak_tot))


# ---------------------------------------------------------------------------
# Deterministic token-dropout augmentation
# ---------------------------------------------------------------------------
#
# Text augmentation with reproducibility: drop ~10% of tokens chosen
# by a per-(doc, position) portable hash — the same document always
# augments the same way on any cluster/partitioning, so an augmented
# corpus is re-derivable instead of stored. Reported as a per-language
# audit of before/after token counts plus an order-free checksum of
# the kept positions (Σ doc_id·pos over kept tokens).
#
# 100 TB shape: one posexplode of the token stream (the wordcount
# shuffle), stateless per-token keep decision, one aggregate. The
# augmented TEXT itself would be re-assembled with array_join over
# filter() in the writer path; the audit needs only counts.

_AUG_DROP_NUM = 6554  # ≈10% of 65536

AUG_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, t.pos AS pos
  FROM (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS l
    FROM documents WHERE text IS NOT NULL
  ), UNNEST(range(1, len(l) + 1)) AS t(pos)
),
decided AS (
  SELECT doc_id, lang, pos,
         CASE WHEN {md5_uniform16_sql("md5(CAST(doc_id AS STRING) || ':' || CAST(pos AS STRING))")} < {_AUG_DROP_NUM}
              THEN 0 ELSE 1 END AS kept
  FROM toks
)
SELECT lang,
       COUNT(*)::BIGINT AS n_tokens,
       SUM(kept)::BIGINT AS n_kept,
       SUM(1 - kept)::BIGINT AS n_dropped,
       SUM(kept * doc_id * pos)::BIGINT AS kept_checksum
FROM decided
GROUP BY lang
"""


@register("augment_token_dropout", AUG_ORACLE)
def augment_token_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% token dropout audit per language:
    (lang, n_tokens, n_kept, n_dropped, kept_checksum)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.posexplode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("pos0", "tok"),
    ).select("doc_id", "lang", (F.col("pos0") + 1).alias("pos"))
    keep_h = md5_uniform16_spark_sql(
        "md5(CAST(doc_id AS STRING) || ':' || CAST(pos AS STRING))"
    )
    decided = toks.select(
        "doc_id",
        "lang",
        "pos",
        F.when(F.expr(keep_h) < _AUG_DROP_NUM, 0).otherwise(1).alias("kept"),
    )
    return decided.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.sum(1 - F.col("kept")).cast("bigint").alias("n_dropped"),
        F.sum(F.col("kept") * F.col("doc_id") * F.col("pos"))
        .cast("bigint")
        .alias("kept_checksum"),
    )


# ---------------------------------------------------------------------------
# Perplexity-band corpus pruning (model-based curation)
# ---------------------------------------------------------------------------
#
# The CCNet/D4-style curation step downstream of the unigram LM score
# (text_unigram_logppl): per source, drop the LOWEST-perplexity decile
# (templated/duplicated common-word soup) and the HIGHEST decile
# (rare-token noise), keep the middle band. Thresholds are per-source
# VALUE cuts at the ceil(0.1n)/ceil(0.9n)-th smallest quantized score
# — computed with integer ceil-division on the counted score grid (the
# conformal-rank discipline), so band membership has no float
# boundary beyond the score's own 6-dp rounding (the logppl oracle
# convention). Scale shape: scoring is the LM join (term-keyed, never
# fact-to-fact); thresholding is one window over the per-source score
# grid; the keep decision is a broadcast threshold join.

_PPL_LOW_NUM, _PPL_LOW_DEN = 1, 10  # drop lowest 10%
_PPL_HIGH_NUM, _PPL_HIGH_DEN = 9, 10  # ...and above the 90% cut

# Promoted rows-only -> oracled in r11: every stage is SQL-expressible
# (the unigram LM score is the oracle-green text_unigram_logppl
# algebra; the band cuts are integer ceil-division ranks on the
# counted score grid). The only float in the chain is the logppl
# round-6 the LM oracle already stands on.
PPL_PRUNE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
cnt AS (SELECT term, COUNT(*)::BIGINT AS c FROM toks GROUP BY term),
tot AS (SELECT COUNT(*)::BIGINT AS n FROM toks),
ppl AS (
  SELECT doc_id, round(-avg(ln(c * 1.0 / n)), 6) AS logppl
  FROM toks JOIN cnt USING (term) CROSS JOIN tot
  GROUP BY doc_id
),
sq AS (
  SELECT doc_id, CAST(ROUND(logppl * 1000000, 0) AS BIGINT) AS sq FROM ppl
),
s AS (
  SELECT d.source, d.doc_id, q.sq
  FROM documents d JOIN sq q USING (doc_id)
),
grid AS (SELECT source, sq, COUNT(*)::BIGINT AS cnt FROM s GROUP BY 1, 2),
cum AS (
  SELECT source, sq,
         SUM(cnt) OVER (PARTITION BY source ORDER BY sq) AS cum
  FROM grid
),
tots AS (SELECT source, COUNT(*)::BIGINT AS n_docs FROM s GROUP BY source),
th AS (
  SELECT c.source,
         MIN(CASE WHEN c.cum >= (({_PPL_LOW_NUM} * t.n_docs)
                                 + {_PPL_LOW_DEN - 1}) // {_PPL_LOW_DEN}
                  THEN c.sq END) AS lo_cut,
         MIN(CASE WHEN c.cum >= (({_PPL_HIGH_NUM} * t.n_docs)
                                 + {_PPL_HIGH_DEN - 1}) // {_PPL_HIGH_DEN}
                  THEN c.sq END) AS hi_cut
  FROM cum c JOIN tots t USING (source)
  GROUP BY c.source
),
flagged AS (
  SELECT s.source, s.doc_id,
         CASE WHEN s.sq <= th.lo_cut THEN 'low'
              WHEN s.sq > th.hi_cut THEN 'high'
              ELSE 'keep' END AS band
  FROM s JOIN th USING (source)
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       SUM(CASE WHEN band = 'keep' THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       SUM(CASE WHEN band = 'low' THEN 1 ELSE 0 END)::BIGINT
         AS n_dropped_low,
       SUM(CASE WHEN band = 'high' THEN 1 ELSE 0 END)::BIGINT
         AS n_dropped_high,
       SUM(CASE WHEN band = 'keep' THEN doc_id ELSE 0 END)::BIGINT
         AS kept_id_sum
FROM flagged
GROUP BY source
"""


@register("corpus_ppl_prune", PPL_PRUNE_ORACLE)
def corpus_ppl_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source perplexity-band pruning report: (source, n_docs,
    n_kept, n_dropped_low, n_dropped_high, kept_id_sum)."""
    from tfm_semisup_spark.queries.text_analysis import text_unigram_logppl

    scores = text_unigram_logppl(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("logppl") * 1000000).cast("bigint").alias("sq"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # r14: per-source totals now derive from the (source, sq) grid
    # (Σ cnt per source — identical values), removing one of the three
    # scored-docs subtree references. An eager checkpoint of the
    # scored frame measured SLOWER (1.90 vs 1.76 s interleaved) — the
    # remaining two references share exchanges cheaply, so the
    # serialization barrier costs more than the recompute it saves.
    s = docs.join(scores, "doc_id")
    grid = s.groupBy("source", "sq").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("source").orderBy("sq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grid.select("source", "sq", F.sum("cnt").over(w).alias("cum"))
    tot = grid.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_docs")
    )
    j = cum.join(F.broadcast(tot), "source")
    k_lo = F.expr(
        f"(({_PPL_LOW_NUM} * n_docs) + {_PPL_LOW_DEN - 1}) div {_PPL_LOW_DEN}"
    )
    k_hi = F.expr(
        f"(({_PPL_HIGH_NUM} * n_docs) + {_PPL_HIGH_DEN - 1}) "
        f"div {_PPL_HIGH_DEN}"
    )
    th = j.groupBy("source").agg(
        F.min(F.when(F.col("cum") >= k_lo, F.col("sq"))).alias("lo_cut"),
        F.min(F.when(F.col("cum") >= k_hi, F.col("sq"))).alias("hi_cut"),
    )
    flagged = s.join(F.broadcast(th), "source").select(
        "source",
        "doc_id",
        F.when(F.col("sq") <= F.col("lo_cut"), F.lit("low"))
        .when(F.col("sq") > F.col("hi_cut"), F.lit("high"))
        .otherwise(F.lit("keep"))
        .alias("band"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("band") == "keep", 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("band") == "low", 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped_low"),
        F.sum(F.when(F.col("band") == "high", 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped_high"),
        F.sum(F.when(F.col("band") == "keep", F.col("doc_id")).otherwise(0))
        .cast("bigint")
        .alias("kept_id_sum"),
    )


# ---------------------------------------------------------------------------
# Negative-sampling table (word2vec unigram^0.75, r10)
# ---------------------------------------------------------------------------
#
# The noise distribution used by skip-gram negative sampling and
# contrastive losses (Mikolov et al. 2013): P(w) ∝ count(w)^0.75. The
# fractional power is computed EXACTLY cross-engine as
# w = floor(sqrt(sqrt(n³))): n³ is an exact integer (< 2^53 after the
# 100k count cap, so the double holds it exactly) and IEEE-754 sqrt is
# correctly rounded on both engines — no libm pow() divergence. Draws
# are the usual md5-deterministic grid: draw i lands at position
# (md5_uniform16('neg#'||i) · W) // 65536 on the cumulative weight
# axis (stratified monotone mapping, exact integers), assigned to a
# word by a range join against the vocab's [cum_lo, cum_hi) intervals.
#
# Scale shape: ONE wordcount aggregate over the corpus; everything
# after runs on the VOCAB grid (bounded) × 1000 draws — the range join
# is a bounded nested loop by construction, never corpus-scale.

_NEG_DRAWS = 1000
_NEG_COUNT_CAP = 100_000


def _neg_w_sql(n: str) -> str:
    return (
        f"CAST(FLOOR(sqrt(sqrt("
        f"CAST(LEAST({n}, {_NEG_COUNT_CAP}) AS DOUBLE)"
        f" * LEAST({n}, {_NEG_COUNT_CAP})"
        f" * LEAST({n}, {_NEG_COUNT_CAP})))) AS BIGINT)"
    )


NEG_SAMPLING_ORACLE = f"""
WITH words AS (
  SELECT w, COUNT(*)::BIGINT AS n
  FROM (
    SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
),
weighted AS (
  SELECT w, n, {_neg_w_sql('n')} AS wt FROM words
),
ranges AS (
  SELECT w, n, wt,
         SUM(wt) OVER (ORDER BY w) - wt AS cum_lo,
         SUM(wt) OVER (ORDER BY w) AS cum_hi
  FROM weighted
),
tot AS (SELECT SUM(wt)::HUGEINT AS big_w FROM weighted),
draws AS (
  SELECT i, ({md5_uniform16_sql("md5('neg#' || CAST(i AS VARCHAR))")}
             * t.big_w) // 65536 AS pos
  FROM range({_NEG_DRAWS}) r(i) CROSS JOIN tot t
),
assigned AS (
  SELECT r.w, r.n, r.wt
  FROM draws d JOIN ranges r
    ON d.pos >= r.cum_lo AND d.pos < r.cum_hi
)
SELECT w AS word, MIN(n)::BIGINT AS corpus_count,
       MIN(wt)::BIGINT AS weight,
       COUNT(*)::BIGINT AS n_sampled
FROM assigned
GROUP BY w
ORDER BY n_sampled DESC, word
LIMIT 15
"""


@register("negative_sampling_table", NEG_SAMPLING_ORACLE)
def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 most-drawn words under 1000 deterministic unigram^0.75
    negative-sampling draws: (word, corpus_count, weight, n_sampled)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
                "w"
            )
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    weighted = words.withColumn("wt", F.expr(_neg_w_sql("n")))
    wsum = Window.orderBy("w")
    ranges = weighted.select(
        "w",
        "n",
        "wt",
        (F.sum("wt").over(wsum) - F.col("wt")).alias("cum_lo"),
        F.sum("wt").over(wsum).alias("cum_hi"),
    )
    tot = weighted.agg(F.sum("wt").cast("bigint").alias("big_w"))
    # decimal(38,0) BEFORE the multiply: u*big_w in raw int64 wraps once
    # Σwt exceeds 2^63/65535 (~2.5e10 distinct tokens — reachable at the
    # 100 TB design point) while the HUGEINT oracle doesn't — the silent
    # engine-divergence class every sibling quantization here avoids
    u = (
        F.expr(md5_uniform16_spark_sql("md5(concat('neg#', CAST(id AS STRING)))"))
        .cast("decimal(38,0)")
    )
    bw = F.col("big_w").cast("decimal(38,0)")
    draws = (
        spark.range(_NEG_DRAWS)
        .crossJoin(F.broadcast(tot))
        .select(
            ((u * bw) - F.pmod(u * bw, F.lit(65536))).cast("decimal(38,0)")
            .alias("pos_num")
        )
        .select((F.col("pos_num") / 65536).cast("decimal(38,0)").alias("pos"))
    )
    assigned = draws.join(
        F.broadcast(ranges),
        (F.col("pos") >= F.col("cum_lo")) & (F.col("pos") < F.col("cum_hi")),
    )
    return (
        assigned.groupBy("w")
        .agg(
            F.min("n").cast("bigint").alias("corpus_count"),
            F.min("wt").cast("bigint").alias("weight"),
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        )
        .select(
            F.col("w").alias("word"), "corpus_count", "weight", "n_sampled"
        )
        .orderBy(F.desc("n_sampled"), "word")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Feature-hashing collision audit (r10)
# ---------------------------------------------------------------------------
#
# The hashing trick (Weinberger et al. 2009) maps vocabulary to 2^b
# buckets and accepts collisions; the operational question per corpus
# is how much token mass collides at a given width. Buckets use the
# portable md5 slice (% 1024 here), so the audit is bit-identical
# cross-engine: (n_buckets_used, max_vocab_per_bucket, n_collided_words,
# n_vocab, pct_token_mass_collided) — one row.
#
# Scale shape: one wordcount aggregate, then everything on the vocab
# grid; the bucket histogram is <= 1024 rows.

_FHASH_BUCKETS = 1024

FEATURE_HASHING_ORACLE = f"""
WITH wc AS (
  SELECT w, COUNT(*)::BIGINT AS n
  FROM (
    SELECT UNNEST(list_filter(string_split(text, ' '), t -> t <> ''))
      AS w
    FROM documents
  ) GROUP BY w
),
bucketed AS (
  SELECT w, n,
         ({md5_uniform16_sql("md5(w)")} % {_FHASH_BUCKETS}) AS bucket
  FROM wc
),
per_bucket AS (
  SELECT bucket, COUNT(*)::BIGINT AS vocab_in_bucket,
         SUM(n)::BIGINT AS mass
  FROM bucketed GROUP BY bucket
)
SELECT COUNT(*)::BIGINT AS n_buckets_used,
       MAX(vocab_in_bucket)::BIGINT AS max_vocab_per_bucket,
       SUM(CASE WHEN vocab_in_bucket >= 2 THEN vocab_in_bucket
                ELSE 0 END)::BIGINT AS n_collided_words,
       SUM(vocab_in_bucket)::BIGINT AS n_vocab,
       ROUND(CAST(SUM(CASE WHEN vocab_in_bucket >= 2 THEN mass ELSE 0 END)
                  AS DOUBLE) * 100.0 / CAST(SUM(mass) AS DOUBLE), 6)
         AS pct_token_mass_collided
FROM per_bucket
"""


@register("feature_hashing_audit", FEATURE_HASHING_ORACLE)
def feature_hashing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision audit of the 1024-bucket hashing trick over the corpus
    vocabulary: one row (n_buckets_used, max_vocab_per_bucket,
    n_collided_words, n_vocab, pct_token_mass_collided)."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
                "w"
            )
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    bucket = (
        F.expr(md5_uniform16_spark_sql("md5(w)")) % _FHASH_BUCKETS
    ).alias("bucket")
    per_bucket = (
        wc.select("w", "n", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab_in_bucket"),
            F.sum("n").cast("bigint").alias("mass"),
        )
    )
    collided = F.col("vocab_in_bucket") >= 2
    return per_bucket.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_used"),
        F.max("vocab_in_bucket").cast("bigint").alias("max_vocab_per_bucket"),
        F.sum(F.when(collided, F.col("vocab_in_bucket")).otherwise(0))
        .cast("bigint")
        .alias("n_collided_words"),
        F.sum("vocab_in_bucket").cast("bigint").alias("n_vocab"),
        F.round(
            F.sum(F.when(collided, F.col("mass")).otherwise(0)).cast("double")
            * 100.0
            / F.sum("mass").cast("double"),
            6,
        ).alias("pct_token_mass_collided"),
    )


# ---------------------------------------------------------------------------
# Curriculum training manifest (r10)
# ---------------------------------------------------------------------------
#
# Curriculum learning (Bengio et al. 2009) orders training data
# easy-to-hard; the pipeline artifact is a MANIFEST: per (difficulty
# decile, shard) row counts the loader consumes in decile order. The
# difficulty proxy here is document length (n_chars); deciles come
# from counted-grid CDF inversion on the bounded n_chars value grid
# (the equidepth/ks discipline — no global sort):
#   dec(x) = ((cum(x) − 1) · 10) // N     (0..9, exact integers,
# value-level so ties share a decile deterministically); shards are
# the portable md5 % 8. One corpus aggregate onto the value grid + one
# grid join back; the manifest is ≤ 80 rows.

_CURR_SHARDS = 8

CURRICULUM_ORACLE = f"""
WITH grid AS (
  SELECT n_chars, COUNT(*)::BIGINT AS cnt FROM documents GROUP BY n_chars
),
cum AS (
  SELECT n_chars,
         SUM(cnt) OVER (ORDER BY n_chars) AS c,
         SUM(cnt) OVER () AS n
  FROM grid
),
dec AS (
  SELECT n_chars, ((c - 1) * 10) // n AS decile FROM cum
)
SELECT d.decile::BIGINT AS decile,
       ({md5_uniform16_sql("md5(CAST(doc_id AS STRING))")}
          % {_CURR_SHARDS})::BIGINT AS shard,
       COUNT(*)::BIGINT AS n_docs,
       SUM(doc.n_chars)::BIGINT AS chars_sum,
       SUM(doc_id)::BIGINT AS id_sum
FROM documents doc JOIN dec d ON doc.n_chars = d.n_chars
GROUP BY 1, 2
"""


@register("curriculum_training_manifest", CURRICULUM_ORACLE)
def curriculum_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-decile x md5-shard curriculum manifest:
    (decile, shard, n_docs, chars_sum, id_sum)."""
    docs = load_table(spark, sf_dir, "documents")
    grid = docs.groupBy("n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = Window.orderBy("n_chars")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = grid.select(
        "n_chars",
        (
            ((F.sum("cnt").over(wc) - 1) * 10)
            - F.pmod(
                (F.sum("cnt").over(wc) - 1) * 10, F.sum("cnt").over(wall)
            )
        ).alias("__num"),
        F.sum("cnt").over(wall).alias("__n"),
    ).select(
        F.col("n_chars").alias("g_chars"),
        (F.col("__num") / F.col("__n")).cast("bigint").alias("decile"),
    )
    shard = (
        F.expr(md5_uniform16_spark_sql("md5(CAST(doc_id AS STRING))"))
        % _CURR_SHARDS
    ).cast("bigint")
    return (
        docs.join(F.broadcast(dec), docs.n_chars == F.col("g_chars"))
        .select("doc_id", "n_chars", "decile", shard.alias("shard"))
        .groupBy("decile", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_sum"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Full LLM-corpus path as ONE oracled lineage (r11, VERDICT r10 #7)
# ---------------------------------------------------------------------------
#
# corpus_pipeline_end_to_end chains dedup + language + quality filters;
# this entry composes the WHOLE preparation path in a single Catalyst
# plan: Gopher quality-rule filter -> exact-dedup keepers (min doc_id
# per md5(text)) -> stratified language sample (md5 threshold) ->
# length-decile curriculum (counted-grid CDF inversion, computed over
# the SAMPLED survivors — the grid re-derives from the chain output,
# not the raw corpus) -> md5 shard assignment with within-shard
# positions. Output manifest: (decile, shard, n_docs, chars_sum,
# id_sum, pos_sum) — pos_sum pins the shard window having run on the
# final lineage (any leaked pre-filter row would shift positions).
#
# Scale shape, per stage: quality filter is a narrow columnar pass;
# keepers shuffle once on md5(text) (text itself never re-shuffles —
# only the projected survivor columns move); the sampler is a narrow
# hash-threshold filter; the decile grid is one bounded aggregate
# (distinct n_chars values) broadcast back; the shard window is ONE
# hash exchange on shard + per-shard sort — the training-shard write
# path. The sampled survivor set feeds three consumers (grid, join,
# window), so it is checkpointed once and released after the manifest
# materializes (the leaked-checkpoint audit pattern).

_CHAIN_SHARDS = 8
_CHAIN_SHARD_EXPR = shard_bucket_sql(
    "md5(CAST(doc_id AS STRING))", _CHAIN_SHARDS
)
_CHAIN_SHARD_SPARK = shard_bucket_spark_sql(
    "md5(CAST(doc_id AS STRING))", _CHAIN_SHARDS
)

FULL_CHAIN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, text, n_chars,
         list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
),
q AS (
  SELECT doc_id, lang, text, n_chars FROM toks
  WHERE len(w) BETWEEN 20 AND 1000
    AND list_avg(list_transform(w, x -> len(x))) >= 3.0
    AND list_avg(list_transform(w, x -> len(x))) <= 8.0
    AND len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(w) >= 0.8
    AND len(list_distinct(w)) * 1.0 / len(w) >= 0.35
    AND len(list_distinct(list_filter(w, x -> x IN ('the', 'a')))) >= 2
),
keepers AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM q
),
dd AS (SELECT doc_id, lang, n_chars FROM keepers WHERE rn = 1),
sampled AS (
  SELECT doc_id, n_chars FROM dd
  WHERE {_STRAT_H_SQL} < {_stratified_threshold_sql()}
),
grid AS (
  SELECT n_chars, COUNT(*)::BIGINT AS cnt FROM sampled GROUP BY n_chars
),
cum AS (
  SELECT n_chars,
         SUM(cnt) OVER (ORDER BY n_chars) AS c,
         SUM(cnt) OVER () AS n
  FROM grid
),
dec AS (SELECT n_chars, ((c - 1) * 10) // n AS decile FROM cum),
sharded AS (
  SELECT s.doc_id, s.n_chars, d.decile,
         {_CHAIN_SHARD_EXPR} AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY {_CHAIN_SHARD_EXPR}
           ORDER BY md5(CAST(doc_id AS STRING)), s.doc_id
         ) AS pos
  FROM sampled s JOIN dec d ON s.n_chars = d.n_chars
)
SELECT decile::BIGINT AS decile, shard::BIGINT AS shard,
       COUNT(*)::BIGINT AS n_docs,
       SUM(n_chars)::BIGINT AS chars_sum,
       SUM(doc_id)::BIGINT AS id_sum,
       SUM(pos)::BIGINT AS pos_sum
FROM sharded
GROUP BY 1, 2
"""


@register("corpus_pipeline_full_chain", FULL_CHAIN_ORACLE)
def corpus_pipeline_full_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter -> exact-dedup keepers -> stratified sample ->
    curriculum deciles (over the sampled set) -> shard assignment, one
    lineage: (decile, shard, n_docs, chars_sum, id_sum, pos_sum)."""
    from tfm_semisup_spark.operators.lineage import release, truncate
    from tfm_semisup_spark.operators.quality import filter_quality_gopher

    docs = load_table(spark, sf_dir, "documents")
    q = filter_quality_gopher(docs)
    wk = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dd = (
        q.withColumn("__rn", F.row_number().over(wk))
        .where(F.col("__rn") == 1)
        .select("doc_id", "lang", "n_chars")
    )
    h = F.expr(_STRAT_H_SPARK)
    thr = F.expr(_stratified_threshold_sql())
    # three consumers below (grid aggregate, grid join, shard window):
    # checkpoint the surviving rows once, release after materializing
    sampled = truncate(dd.where(h < thr).select("doc_id", "n_chars"))
    grid = sampled.groupBy("n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = Window.orderBy("n_chars")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = grid.select(
        "n_chars",
        (
            ((F.sum("cnt").over(wc) - 1) * 10)
            - F.pmod(
                (F.sum("cnt").over(wc) - 1) * 10, F.sum("cnt").over(wall)
            )
        ).alias("__num"),
        F.sum("cnt").over(wall).alias("__n"),
    ).select(
        F.col("n_chars").alias("g_chars"),
        (F.col("__num") / F.col("__n")).cast("bigint").alias("decile"),
    )
    wsh = Window.partitionBy("shard").orderBy("__h", "doc_id")
    sharded = (
        sampled.join(F.broadcast(dec), sampled.n_chars == F.col("g_chars"))
        .select(
            "doc_id",
            "n_chars",
            "decile",
            F.md5(F.col("doc_id").cast("string")).alias("__h"),
            F.expr(_CHAIN_SHARD_SPARK).alias("shard"),
        )
        .withColumn("pos", F.row_number().over(wsh).cast("long"))
    )
    out = truncate(
        sharded.groupBy(
            F.col("decile").cast("bigint").alias("decile"),
            F.col("shard").cast("bigint").alias("shard"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_sum"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.sum("pos").cast("bigint").alias("pos_sum"),
        )
    )
    release(sampled)
    return out

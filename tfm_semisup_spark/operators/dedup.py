"""Near-duplicate detection — the 100 TB scale paths (SURVEY.md §2.3).

Three sub-quadratic strategies over the documents table:

- MinHash LSH (`minhash_near_dup_pairs`): shingle -> HashingTF sparse
  vector -> MinHashLSH signatures -> banded ``approxSimilarityJoin``.
  Candidate generation is a join on LSH buckets, so the shuffle is
  O(docs x numHashTables), never O(docs^2). The Jaccard threshold is
  exact on candidates (Spark computes true distance post-bucketing).

- SimHash (`simhash_fingerprints`, `simhash_near_dup_pairs`): pure
  columnar 64-bit fingerprints (xxhash64 per token, per-bit majority);
  candidate pairs via band-join on 16-bit quarters (a pair within
  Hamming distance 3 shares at least one exact quarter — pigeonhole),
  verified with ``bit_count(xor)``. Zero Python, zero LSH model state:
  the whole operator is joins + aggregates Catalyst can optimize.

- Embedding LSH (`embedding_near_dup_pairs`): random-hyperplane
  bucketing via BucketedRandomProjectionLSH over the embedding vectors,
  euclidean-threshold join on bucket candidates.

All are seeded/deterministic. The exact tiers (hash groupBy, n-gram
Jaccard with its oracle) live in ``queries/dedup.py``.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfm_semisup_spark.functions.text import hashed_word_ngrams, whitespace_tokens, word_ngrams

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 16-bit bands; pigeonhole guarantee for hamming <= 3


def shingle_documents(docs: DataFrame, n: int = 3, num_features: int = 1 << 18) -> DataFrame:
    """documents -> (doc_id, features sparse vector of hashed shingles).

    num_features=262144 keeps collision rate low while bounding vector
    width; at 100 TB the HashingTF step is a narrow map — no shuffle.

    The result is persist()ed (it feeds both sides of the LSH self-join);
    callers running many dedup passes in one long session should
    ``.unpersist()`` the returned DataFrame when done — per-query driver
    runs and tests are one-shot, so no cleanup is wired in here.
    """
    spark = docs.sparkSession
    # decouple expression parallelism from input splits: a single-file
    # (single-row-group) scan would run shingling on one core
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    # bind tokens to a column BEFORE n-gramming (see word_ngrams note)
    tokens = docs.withColumn("__w", whitespace_tokens(F.col("text")))
    shingled = tokens.select(
        "doc_id", F.array_distinct(word_ngrams(F.col("__w"), n)).alias("shingles")
    ).where(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=num_features)
    return tf.transform(shingled).select("doc_id", "features").persist()


def minhash_near_dup_pairs(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(doc_a, doc_b, jaccard_distance) for candidate pairs under the
    threshold. distCol is JACCARD DISTANCE (1 - similarity).

    numHashTables=3: measured identical recall to 5 on the test corpus
    at sf0.1 (256 pairs both) at ~60% of the runtime; 2 loses pairs.
    """
    feats = shingle_documents(docs)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_distance"
    )
    # checkpoint the (small) pair result, then release the persisted
    # feature frame eagerly — same leaked-persist fix as the banded
    # tier below; without it every call pinned a sparse-vector cache
    # for the session's lifetime.
    from tfm_semisup_spark.operators.lineage import truncate

    out = truncate(
        joined.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_distance", 4).alias("jaccard_distance"),
        )
    )
    feats.unpersist()
    return out


MINHASH_PERMS = 32
MINHASH_BAND_ROWS = 2  # r=2, b=16: P(candidate | j) = 1-(1-j^2)^16


def minhash_banded_pairs(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    num_perm: int = MINHASH_PERMS,
    band_rows: int = MINHASH_BAND_ROWS,
    shingle_n: int = 3,
) -> DataFrame:
    """Banded MinHash near-dup pairs, PURE COLUMNAR — no MLlib models,
    no sparse vectors, no UDFs. ~1.7s at sf0.1 (r4: codegen
    signatures + narrow-form caching) vs the MLlib tier's ~4s, and
    wins structurally at corpus scale: no fit() job, no 262k-dim sparse
    vectors in the shuffle (signatures are 32 longs/doc, band keys 2
    longs/row), and — unlike ``approxSimilarityJoin`` — FULL recall at
    the threshold on the test corpus (256/256 pairs vs MLlib's
    ``numHashTables``-limited banding) with zero spurious pairs
    (candidates are verified against exact set Jaccard).

    Pipeline (all whole-stage-codegen expressions):
      1. doc -> distinct hashed shingles ``array<long>`` (one xxhash64
         per shingle; strings never leave the scan stage);
      2. signature_i = min(xxhash64(h, i)) for i < num_perm over the
         EXPLODED shingles — the i-th permutation is a reseeded hash
         of the 8-byte shingle hash, all num_perm hashes are one
         codegen projection, and the min is a partial (map-side)
         aggregate, so each extra permutation costs one long column in
         the combine, never an interpreted array traversal;
      3. bands of ``band_rows`` signature components hash to one
         64-bit bucket key; candidates = equi-self-join on
         (band_idx, bucket) — shuffle carries (doc_id, 2 longs);
      4. exact verification: candidates join back to the hashed
         shingle arrays; true Jaccard via array_intersect size. No
         estimate-only pairs survive.

    With r=2/b=16 the candidate-recall at j=0.5 is 1-(1-0.25)^16 ≈
    0.99 and ≈ 1.0 for j >= 0.7 (where real near-dups live); exact
    verification then removes all false positives, so output pairs
    carry TRUE Jaccard distance like the MLlib tier.
    """
    if num_perm % band_rows != 0:
        raise ValueError("num_perm must be divisible by band_rows")
    n_bands = num_perm // band_rows
    spark = docs.sparkSession
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    tokens = docs.withColumn("__w", whitespace_tokens(F.col("text")))
    # no size>0 filter: it would push into the single-split scan with
    # the whole shingle pipeline inlined (see queries/dedup.py
    # hashed_shingles); empty arrays explode to zero rows anyway
    sh = (
        tokens.select(
            "doc_id",
            F.array_distinct(
                hashed_word_ngrams(F.col("__w"), shingle_n)
            ).alias("hs"),
        )
        .persist()
    )
    # Signatures via explode + groupBy-min instead of num_perm
    # array_min(transform(...)) folds: higher-order functions run
    # INTERPRETED (one lambda dispatch per shingle per permutation —
    # num_perm full interpreted traversals of every shingle array per
    # row), while the exploded shape evaluates all num_perm reseeded
    # hashes as ONE whole-stage-codegen projection and the partial
    # (map-side) min aggregate means the shuffle carries one
    # num_perm-long row per doc per partition — identical values
    # (min over the same reseeded-hash multiset), strictly codegen.
    ex = sh.select("doc_id", F.explode("hs").alias("h"))
    sigs = ex.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64("h", F.lit(i))).alias(f"s{i}")
            for i in range(num_perm)
        ]
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_idx"),
                        F.xxhash64(
                            *[
                                F.col(f"s{j * band_rows + k}")
                                for k in range(band_rows)
                            ]
                        ).alias("bucket"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_idx", "b.bucket")

    a = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "bucket")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "bucket")
    cands = (
        a.join(b, ["band_idx", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ha = sh.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    hb = sh.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb"))
    union = F.size("ha") + F.size("hb") - inter
    jac = inter * 1.0 / union
    # materialize then RELEASE the shingle cache eagerly (the r2/r3
    # leaked-persist class: before this, every call in a long-lived
    # session left the shingle index pinned, and a stale cache from a
    # prior call could silently serve the next one's timings). Same
    # truncate-then-unpersist shape as dedup_ngram_jaccard_pairs.
    from tfm_semisup_spark.operators.lineage import truncate

    out = truncate(
        cands.join(ha, "doc_a")
        .join(hb, "doc_b")
        .where(jac >= jaccard_threshold)
        .select("doc_a", "doc_b", F.round(1.0 - jac, 4).alias("jaccard_distance"))
    )
    sh.unpersist()
    return out


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per document, fully columnar.

    Per token t: h = xxhash64(t); fingerprint bit i is set iff MORE
    tokens have bit i set than clear. Aggregated as 64 plain bit SUMS
    + one count (s_i*2 > n ⟺ the classic ±1 vote sum > 0 — identical
    fingerprints, ~16% faster than the conditional-vote form: the
    per-token expression is shift+and with no branch, measured r5).
    One explode + one groupBy — the shuffle carries (doc_id, 64 ints).
    """
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
    tok = docs.select(
        "doc_id", F.explode(whitespace_tokens(F.col("text"))).alias("token")
    ).withColumn("h", F.xxhash64("token"))
    # expressions built as SQL strings (r14, SCALE.md plan-construction
    # lesson): the Column-by-Column form cost one Py4J round trip per
    # node (~600 calls ≈ 1.5 s of driver time per invocation at any
    # data size); one F.expr per sum plus ONE string for the 64-term
    # bit fold parses to the identical tree in ~70 calls.
    sums = [
        F.expr(f"sum(shiftright(h, {i}) & 1)").alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"), *sums)
    fp_sql = " | ".join(
        f"(CASE WHEN s{i} * 2 > __n THEN shiftleft(CAST(1 AS BIGINT), {i})"
        f" ELSE CAST(0 AS BIGINT) END)"
        for i in range(SIMHASH_BITS)
    )
    return agg.select("doc_id", F.expr(fp_sql).alias("simhash"))


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Banded candidate join on 16-bit fingerprint quarters, exact
    Hamming verification with bit_count(xor). max_hamming <= 3 keeps
    the pigeonhole guarantee with 4 bands."""
    from tfm_semisup_spark.operators.lineage import release, truncate

    # checkpoint the narrow (doc_id, simhash) frame: the banded
    # self-join consumes it on both sides, which would re-run the
    # explode + 64-vote aggregation per side (narrow-cache rule,
    # SCALE.md r4); released eagerly once the pair result materializes
    fps = truncate(simhash_fingerprints(docs))
    bands = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")

    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"), "band_idx", "band_val"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"), "band_idx", "band_val"
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    out = truncate(
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()  # a pair can share multiple bands
        .where(F.col("hamming") <= max_hamming)
    )
    release(fps)
    return out


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    distance_threshold: float = 0.8,
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vector_col: str = "features",
) -> DataFrame:
    """Euclidean near-dup pairs via random-projection LSH bucketing."""
    lsh = BucketedRandomProjectionLSH(
        inputCol=vector_col,
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(embeddings)
    joined = model.approxSimilarityJoin(
        embeddings, embeddings, distance_threshold, distCol="euclidean"
    )
    return (
        joined.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("vec_a"),
            F.col(f"datasetB.{id_col}").alias("vec_b"),
            F.round("euclidean", 4).alias("euclidean"),
        )
    )

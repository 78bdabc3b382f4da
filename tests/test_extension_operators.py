"""Extension-surface tests: LSH dedup/ANN determinism + sanity,
SimHash algebra, streaming window parity with batch, stateful op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.dedup import (
    minhash_near_dup_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from tfm_semisup_spark.operators.similarity import (
    ann_top_k,
    build_ann_index,
    with_feature_vectors,
)

SF = "/root/testdata/sf0.001"


def test_simhash_fingerprints_deterministic_and_complete(spark):
    docs = load_table(spark, SF, "documents")
    fp1 = dict(simhash_fingerprints(docs).collect())
    fp2 = dict(simhash_fingerprints(docs.repartition(7)).collect())
    assert fp1 == fp2  # partitioning-independent
    assert len(fp1) == docs.count()


def test_simhash_identical_docs_zero_hamming(spark):
    # two rows with identical text must collide exactly
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "totally different words entirely")],
        ["doc_id", "text"],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_dup_pairs(df, 64).collect()}
    assert pairs[(1, 2)] == 0


def test_minhash_pairs_subset_of_true_near_dups(spark):
    docs = load_table(spark, SF, "documents")
    pairs = minhash_near_dup_pairs(docs, jaccard_threshold=0.4).collect()
    # approxSimilarityJoin verifies true distance on candidates: every
    # returned pair must satisfy the threshold
    assert all(r["jaccard_distance"] <= 0.6 + 1e-9 for r in pairs)
    # deterministic under fixed seed
    again = minhash_near_dup_pairs(docs, jaccard_threshold=0.4).collect()
    assert sorted(map(tuple, pairs)) == sorted(map(tuple, again))


def test_minhash_banded_equals_exact_pairs(spark):
    """The columnar banded tier must find EXACTLY the exact-Jaccard
    pair set (candidates verified against true set Jaccard, recall
    1-(1-j^2)^16 ≈ 1 for j >= 0.5 corpus pairs). This test is also the
    regression guard for the PySpark higher-order-function trap where
    a two-parameter lambda (`lambda h, i=i:`) binds the would-be seed
    to the ARRAY INDEX and every permutation collapses to one
    expression — that bug zeroed signature agreement on 0.9-Jaccard
    pairs and only this equality check catches it."""
    from tfm_semisup_spark.operators.dedup import minhash_banded_pairs
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    docs = load_table(spark, SF, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_ngram_jaccard_pairs"](spark, SF).collect()
    }
    banded = {
        (r["doc_a"], r["doc_b"]): r["jaccard_distance"]
        for r in minhash_banded_pairs(docs, jaccard_threshold=0.5).collect()
    }
    assert set(banded) == exact
    assert all(0.0 <= d <= 0.5 + 1e-9 for d in banded.values())
    # deterministic: hash-defined, no RNG state
    again = {
        (r["doc_a"], r["doc_b"]): r["jaccard_distance"]
        for r in minhash_banded_pairs(docs, jaccard_threshold=0.5).collect()
    }
    assert banded == again


def test_ann_lsh_topk_contains_close_neighbors(spark):
    emb = with_feature_vectors(load_table(spark, SF, "embeddings"))
    model = build_ann_index(emb)
    q = emb.where(F.col("vec_id") == 0).head()["features"]
    got = ann_top_k(model, emb.where(F.col("vec_id") != 0), q, k=10).collect()
    assert len(got) == 10
    assert all(r["euclidean"] >= 0 for r in got)


def test_streaming_tumbling_matches_batch(spark):
    from tfm_semisup_spark.queries.windows import tumbling_window_hourly
    from tfm_semisup_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        tumbling_counts_stream,
    )

    stream = read_events_stream(spark, SF)
    result = tumbling_counts_stream(stream)
    run_available_now(result, "stream_tumbling", output_mode="complete")
    streamed = {
        (str(r["window_start"]), r["n"], r["sum_value"])
        for r in spark.table("stream_tumbling").collect()
    }
    batch = {
        (r["window_start"], r["n"], r["sum_value"])
        for r in tumbling_window_hourly(spark, SF).collect()
    }
    # window_start formats differ (datetime vs string); normalize
    streamed_norm = {(s[:19], n, v) for s, n, v in streamed}
    assert streamed_norm == batch


def test_streaming_stateful_user_counts(spark):
    from tfm_semisup_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        running_user_counts_stream,
    )

    stream = read_events_stream(spark, SF)
    result = running_user_counts_stream(stream)
    run_available_now(result, "stream_user_counts", output_mode="update")
    out = spark.table("stream_user_counts")
    totals = {r["user_id"]: r["total_events"] for r in out.collect()}
    batch = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF, "events").groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # availableNow may process several micro-batches; the LAST update per
    # user must equal the batch total
    last = (
        out.groupBy("user_id").agg(F.max("total_events").alias("total")).collect()
    )
    assert {r["user_id"]: r["total"] for r in last} == batch


def test_streaming_sliding_matches_batch(spark):
    from tfm_semisup_spark.queries.windows import sliding_window_2h_1h
    from tfm_semisup_spark.streaming.events import read_events_stream, run_available_now

    from pyspark.sql import functions as F

    stream = read_events_stream(spark, SF)
    result = (
        stream.withWatermark("ts", "4 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )
    run_available_now(result, "stream_sliding", output_mode="complete")
    streamed = {
        (str(r["window_start"])[:19], r["n"], r["sum_value"])
        for r in spark.table("stream_sliding").collect()
    }
    batch = {
        (r["window_start"], r["n"], r["sum_value"])
        for r in sliding_window_2h_1h(spark, SF).collect()
    }
    assert streamed == batch


def test_streaming_exactly_once_file_sink(spark, tmp_path):
    """File sink + checkpointLocation: re-running availableNow over the
    same source adds NO duplicate rows (offset tracking in the
    checkpoint makes the pipeline restart-safe)."""
    from tfm_semisup_spark.streaming.events import read_events_stream

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            read_events_stream(spark, SF)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()  # same source, same checkpoint -> no new data
    n2 = spark.read.parquet(out).count()
    assert n1 == 1000
    assert n2 == n1


def test_value_trend_mapinpandas_equals_applyinpandas(spark):
    """The scale path (mapInPandas over key-contiguous partitions, with
    boundary-group carry-over) must reproduce the canonical
    applyInPandas result exactly (round-6dp) — including single-row
    users (slope NaN)."""
    import math

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.operators.grouped_pandas import (
        per_user_value_trend,
        per_user_value_trend_apply,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")

    def norm(df):
        return {
            r["user_id"]: (
                r["n"],
                None
                if r["slope"] is None or math.isnan(r["slope"])
                else round(r["slope"], 6),
            )
            for r in df.collect()
        }

    fast = norm(per_user_value_trend(events))
    ref = norm(per_user_value_trend_apply(events))
    assert fast == ref
    assert len(fast) > 0


def test_value_trend_carry_over_across_batches(spark):
    """Force multi-batch partitions (tiny Arrow batch size) so groups
    straddle batch boundaries — the carry-over stitching must still
    produce whole-group results."""
    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.operators.grouped_pandas import (
        per_user_value_trend,
        per_user_value_trend_apply,
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        events = load_table(spark, "/root/testdata/sf0.001", "events")
        fast = {
            (r["user_id"], r["n"]) for r in per_user_value_trend(events).collect()
        }
        ref = {
            (r["user_id"], r["n"])
            for r in per_user_value_trend_apply(events).collect()
        }
        assert fast == ref
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    """Hash-based sampling: identical across reruns/partitionings, full
    keep for unlisted languages, approximate rate for listed ones."""
    from tfm_semisup_spark.queries.corpus_prep import (
        SAMPLE_RATES,
        corpus_stratified_sample,
    )

    sf = "/root/testdata/sf0.001"
    r1 = {r["lang"]: (r["n_total"], r["n_kept"]) for r in corpus_stratified_sample(spark, sf).collect()}
    r2 = {r["lang"]: (r["n_total"], r["n_kept"]) for r in corpus_stratified_sample(spark, sf).collect()}
    assert r1 == r2
    for lang, (total, kept) in r1.items():
        rate = SAMPLE_RATES.get(lang, 1.0)
        if rate == 1.0:
            assert kept == total, lang
        else:
            assert 0 < kept < total, lang
            # binomial-ish tolerance around the target rate
            assert abs(kept / total - rate) < 0.2, (lang, kept / total, rate)


def test_doc_chunks_cover_all_tokens_with_overlap(spark):
    """Chunking invariants: every doc's token count is recoverable from
    its chunk sizes (n_tokens sum == n_words + overlap double-count),
    first chunk starts at 0, ids contiguous."""
    from pyspark.sql import functions as F

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.queries.corpus_prep import (
        CHUNK_STEP,
        CHUNK_TOKENS,
        doc_chunks_overlap,
    )

    sf = "/root/testdata/sf0.001"
    chunks = doc_chunks_overlap(spark, sf)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_id").alias("max_id"),
            F.sum("n_tokens").alias("tok_sum"),
        )
        .collect()
    )
    words = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf, "documents")
        .select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n"),
        )
        .collect()
    }
    overlap = CHUNK_TOKENS - CHUNK_STEP
    for r in per_doc:
        n = words[r["doc_id"]]
        assert r["max_id"] == r["n_chunks"] - 1  # contiguous ids from 0
        # chunks tile the doc: sum of sizes = n + overlap re-counted once
        # per chunk boundary (each non-first chunk re-reads `overlap`
        # tokens, except a final short chunk that may hold fewer)
        assert r["tok_sum"] >= n
        assert r["tok_sum"] <= n + overlap * (r["n_chunks"] - 1)


def test_ann_batch_topk_recall_vs_exact(spark):
    """LSH-amortized batch ANN must agree with the exact batch top-k on
    most neighbors (euclidean vs cosine rankings differ only through
    vector norms here, so compare against exact EUCLIDEAN top-k), and
    be deterministic across runs."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.operators.similarity import (
        ann_top_k_batch,
        build_ann_index,
        with_feature_vectors,
    )
    from tfm_semisup_spark.queries.similarity import BATCH_TOPK_K

    sf = "/root/testdata/sf0.001"
    emb = with_feature_vectors(load_table(spark, sf, "embeddings"))
    queries = emb.where(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("query_id"), "features"
    )
    corpus = emb.where(F.col("vec_id") % 100 != 1)
    model = build_ann_index(emb)

    def run():
        return {
            (r["query_id"], r["vec_id"])
            for r in ann_top_k_batch(model, corpus, queries, k=BATCH_TOPK_K).collect()
        }

    got = run()
    assert got == run()  # deterministic

    # exact euclidean batch top-k via the same partitioned-rank shape
    qd = emb.where(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    cd = emb.where(F.col("vec_id") % 100 != 1).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("cv")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    w = Window.partitionBy("query_id").orderBy("d", "vec_id")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cd.crossJoin(F.broadcast(qd))
        .select("query_id", "vec_id", dist.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= BATCH_TOPK_K)
        .collect()
    }
    n_queries = len({q for q, _ in exact})
    assert n_queries >= 3
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, f"batch ANN recall {recall:.2f} vs exact"


def test_ivf_batch_topk_recall_and_determinism(spark):
    """Columnar batch IVF: deterministic, candidate set restricted to
    probed buckets, decent recall vs exact euclidean top-k."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.operators.similarity import (
        build_ivf_index,
        ivf_top_k_batch,
        with_feature_vectors,
    )

    sf = "/root/testdata/sf0.001"
    emb = with_feature_vectors(load_table(spark, sf, "embeddings"))
    model, bucketed = build_ivf_index(emb)
    queries = emb.where(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("query_id"), "features"
    )
    corpus = bucketed.where(F.col("vec_id") % 100 != 1)

    def run():
        return {
            (r["query_id"], r["vec_id"])
            for r in ivf_top_k_batch(model, corpus, queries, k=5, n_probe=4).collect()
        }

    got = run()
    assert got == run()

    qd = emb.where(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    cd = emb.where(F.col("vec_id") % 100 != 1).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("cv")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    w = Window.partitionBy("query_id").orderBy("d", "vec_id")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cd.crossJoin(F.broadcast(qd))
        .select("query_id", "vec_id", dist.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"IVF batch recall {recall:.2f} (n_probe=4/16 buckets)"


def test_pq_topk_recall_and_determinism(spark):
    """Product-quantization ANN (third tier next to LSH/IVF):
    deterministic (seeded codebooks + hash sample), codes are valid
    [0, codes) ints, and ADC shortlist + exact re-rank reaches good
    recall vs exact euclidean top-k (0.9 measured; bound left slack)."""
    from pyspark.sql import functions as F

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.operators.similarity import build_pq_index, pq_top_k

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    codebooks, encoded = build_pq_index(emb)
    assert len(codebooks) == 16 and all(cb.shape == (32, 4) for cb in codebooks)

    code_bounds = encoded.agg(
        F.min(F.array_min("pq_codes")).alias("lo"),
        F.max(F.array_max("pq_codes")).alias("hi"),
        F.min(F.size("pq_codes")).alias("sz"),
    ).head()
    assert code_bounds["lo"] >= 0 and code_bounds["hi"] < 32
    assert code_bounds["sz"] == 16

    q = emb.where(F.col("vec_id") == 0).head()["embedding"]
    corpus = encoded.where(F.col("vec_id") != 0)
    got = pq_top_k(codebooks, corpus, q, k=10).collect()
    assert got == pq_top_k(codebooks, corpus, q, k=10).collect()

    qlit = F.array(*[F.lit(float(x)) for x in q])
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                qlit,
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    exact = {
        r["vec_id"]
        for r in emb.where(F.col("vec_id") != 0)
        .select("vec_id", dist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    recall = len({r["vec_id"] for r in got} & exact) / 10
    assert recall >= 0.6, f"PQ recall {recall:.2f} vs exact top-10"


def test_pq_sampled_training_path(spark):
    """The bounded-sample codebook path (the 100 TB default): with
    max_train_rows below the corpus size, train_mod is derived > 1,
    the driver sample is hard-capped, output codes stay valid, the
    encoding is deterministic under repartitioning, and recall vs
    exact top-k stays useful. This is the path the registered
    similarity_pq_topk query exercises (max_train_rows=256)."""
    from pyspark.sql import functions as F

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.operators.similarity import build_pq_index, pq_top_k

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")  # 500 rows > 256 cap

    codebooks, encoded = build_pq_index(emb, max_train_rows=256)
    assert len(codebooks) == 16 and all(cb.shape == (32, 4) for cb in codebooks)
    bounds = encoded.agg(
        F.min(F.array_min("pq_codes")).alias("lo"),
        F.max(F.array_max("pq_codes")).alias("hi"),
        F.min(F.size("pq_codes")).alias("sz"),
    ).head()
    assert bounds["lo"] >= 0 and bounds["hi"] < 32 and bounds["sz"] == 16

    # deterministic under a different partitioning (hash-ordered sample)
    cb2, _ = build_pq_index(emb.repartition(7), max_train_rows=256)
    import numpy as np

    for a, b in zip(codebooks, cb2):
        assert np.allclose(a, b)

    q = emb.where(F.col("vec_id") == 0).head()["embedding"]
    got = pq_top_k(codebooks, encoded.where(F.col("vec_id") != 0), q, k=10)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                qlit,
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    exact = {
        r["vec_id"]
        for r in emb.where(F.col("vec_id") != 0)
        .select("vec_id", dist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    recall = len({r["vec_id"] for r in got.collect()} & exact) / 10
    assert recall >= 0.5, f"sampled-path PQ recall {recall:.2f} vs exact top-10"


def test_ivfpq_recall_and_determinism(spark):
    """Composed IVF-PQ: coarse-bucket pruning + ADC + exact re-rank
    keeps useful recall vs exact top-10, returns exactly k rows, and is
    deterministic under repartitioning (seeded trainers, hash-capped
    samples)."""
    from pyspark.sql import functions as F

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_top_k,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents, books, encoded = build_ivfpq_index(emb, max_train_rows=256)
    q = emb.where(F.col("vec_id") == 0).head()["embedding"]
    got = ivfpq_top_k(
        cents, books, encoded.where(F.col("vec_id") != 0), q, k=10, n_probe=6
    ).collect()
    assert len(got) == 10

    cents2, books2, encoded2 = build_ivfpq_index(
        emb.repartition(7), max_train_rows=256
    )
    got2 = ivfpq_top_k(
        cents2, books2, encoded2.where(F.col("vec_id") != 0), q, k=10, n_probe=6
    ).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in got2]

    qlit = F.array(*[F.lit(float(x)) for x in q])
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                qlit,
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    exact = {
        r["vec_id"]
        for r in emb.where(F.col("vec_id") != 0)
        .select("vec_id", dist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    recall = len({r["vec_id"] for r in got} & exact) / 10
    assert recall >= 0.4, f"IVF-PQ recall {recall:.2f} vs exact top-10"


def test_ivf_derived_centroids_recall_two_corpus_sizes(spark):
    """round 4 (VERDICT r3 #5): num_centroids=None derives ~sqrt(N), so
    the pruning ratio holds as the corpus grows. Recall vs exact top-k
    must stay useful at BOTH corpus sizes with the derived setting and
    a probe count proportional to the derived bucket count."""
    import math
    import random

    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from tfm_semisup_spark.operators.similarity import (
        build_ivf_index,
        ivf_top_k,
        resolve_num_centroids,
    )

    assert resolve_num_centroids(500) == 22
    assert resolve_num_centroids(4_000) == 63
    assert resolve_num_centroids(10**9) == 31_623
    assert resolve_num_centroids(10**12) == 65_536  # clamped

    dim = 16
    for n in (500, 4_000):
        rng = random.Random(n)
        rows = [
            (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).withColumn("features", array_to_vector("embedding"))
        model, bucketed = build_ivf_index(df)  # derived num_centroids
        k_cent = len(model.clusterCenters())
        # r4: the corpus-size probe is approx_count_distinct (the scale
        # answer — an exact count() was the one remaining full-count
        # probe), so the derived k lands within HLL error of the
        # exact-N resolve, not equal to it
        expected = resolve_num_centroids(n)
        assert abs(k_cent - expected) <= max(2, int(0.1 * expected)), (
            k_cent,
            expected,
        )
        q = rows[0][1]
        n_probe = max(4, k_cent // 4)
        got = {
            r["vec_id"]
            for r in ivf_top_k(
                model,
                bucketed.where(F.col("vec_id") != 0),
                q,
                k=10,
                n_probe=n_probe,
            ).collect()
        }
        by_dist = sorted(
            (
                (math.dist(q, v), i)
                for i, v in rows
                if i != 0
            )
        )
        exact = {i for _, i in by_dist[:10]}
        recall = len(got & exact) / 10
        assert recall >= 0.6, f"n={n} k={k_cent} probe={n_probe} recall={recall}"

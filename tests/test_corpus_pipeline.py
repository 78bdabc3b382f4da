"""Fluent CorpusPipeline: step composition, laziness, correctness of
each filter against direct computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.pipeline import CorpusPipeline

SF = "/root/testdata/sf0.001"


def test_dedup_exact_keeps_min_id(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (5, "same text"), (3, "other text")], ["doc_id", "text"]
    )
    out = CorpusPipeline.from_documents(docs).dedup_exact().df()
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_language_and_quality_filters_match_direct(spark):
    docs = load_table(spark, SF, "documents")
    out = (
        CorpusPipeline.from_documents(docs)
        .filter_language({"en", "de"})
        .filter_quality(min_tokens=20, max_stop_ratio=0.10)
        .df()
    )
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    stop = F.size(F.filter(toks, lambda t: t.isin(["the", "a"])))
    direct = docs.where(
        F.col("lang").isin("de", "en")
        & (F.size(toks) >= 20)
        & (stop * 1.0 / F.size(toks) <= 0.10)
    )
    assert out.count() == direct.count()
    assert out.count() > 0


def test_full_chain_single_plan_and_enrichment(spark):
    docs = load_table(spark, SF, "documents")
    pipe = (
        CorpusPipeline.from_documents(docs)
        .dedup_exact()
        .filter_language({"en", "de", "fr", "es", "zh"})
        .filter_quality(min_tokens=5)
        .near_dedup_minhash(jaccard_threshold=0.6)
        .with_fingerprints()
    )
    out = pipe.df()
    rows = out.collect()
    assert rows and {"content_fp", "n_tokens"} <= set(out.columns)
    # near-dedup dropped the higher-id member of each near-dup pair;
    # survivors are unique by content hash
    fps = [r["content_fp"] for r in rows]
    assert len(fps) == len(set(fps))
    # chain is deterministic
    again = sorted(r["doc_id"] for r in pipe.df().collect())
    assert again == sorted(r["doc_id"] for r in rows)


def test_pipeline_sample_chunk_pack_end_to_end(spark):
    """Round-2 corpus-prep stages compose with the round-1 chain into
    one lazy plan: sample -> chunk -> pack; invariants checked."""
    from pyspark.sql import functions as F

    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.pipeline import CorpusPipeline

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = (
        CorpusPipeline.from_documents(docs)
        .stratified_sample({"en": 0.5}, seed=17)
        .chunk(chunk_tokens=40, step=30)
        .pack(ctx_tokens=128, n_buckets=8)
        .df()
    )
    rows = out.collect()
    assert rows

    # sampling: en is reduced, other languages fully kept (doc granularity)
    n_docs_en = len({r["doc_id"] for r in rows if r["lang"] == "en"})
    total_en = docs.where(F.col("lang") == "en").count()
    assert 0 < n_docs_en < total_en
    n_docs_de = len({r["doc_id"] for r in rows if r["lang"] == "de"})
    assert n_docs_de == docs.where(F.col("lang") == "de").count()

    # chunking: chunk text <= 40 tokens, ids contiguous from 0 per doc
    for r in rows:
        assert 1 <= len(r["text"].split()) <= 40
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_id"])
    for ids in by_doc.values():
        assert sorted(ids) == list(range(len(ids)))

    # packing: bins within a bucket are contiguous from 0
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["pack_bucket"], set()).add(r["pack_bin"])
    for bins in by_bucket.values():
        assert bins == set(range(len(bins)))

    # determinism end-to-end
    again = (
        CorpusPipeline.from_documents(docs)
        .stratified_sample({"en": 0.5}, seed=17)
        .chunk(chunk_tokens=40, step=30)
        .pack(ctx_tokens=128, n_buckets=8)
        .df()
        .collect()
    )
    key = lambda r: (r["doc_id"], r["chunk_id"])
    assert sorted(map(key, rows)) == sorted(map(key, again))

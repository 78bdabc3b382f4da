"""Strict first-fit packing invariants (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.packing import pack_first_fit

SF = "/root/testdata/sf0.001"
CTX = 200


def test_first_fit_bins_never_overflow_and_cover_all_docs(spark):
    docs = load_table(spark, SF, "documents")
    packed = pack_first_fit(docs, ctx_tokens=CTX, n_buckets=8)
    rows = packed.collect()

    # every doc exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )

    # strict invariant: a bin exceeds CTX only as a singleton oversized doc
    bins = {}
    for r in rows:
        bins.setdefault((r["pack_bucket"], r["pack_bin"]), []).append(r["n_tokens"])
    assert bins
    for sizes in bins.values():
        if sum(sizes) > CTX:
            assert len(sizes) == 1 and sizes[0] > CTX

    # bins are contiguous from 0 within each bucket
    by_bucket = {}
    for (bucket, b), _ in bins.items():
        by_bucket.setdefault(bucket, set()).add(b)
    for got in by_bucket.values():
        assert got == set(range(len(got)))


def test_first_fit_deterministic_across_partitionings(spark):
    docs = load_table(spark, SF, "documents")

    def run(df):
        return sorted(
            (r["doc_id"], r["pack_bucket"], r["pack_bin"])
            for r in pack_first_fit(df, ctx_tokens=CTX, n_buckets=8).collect()
        )

    assert run(docs) == run(docs.repartition(13))


def test_first_fit_carry_over_across_arrow_batches(spark):
    """Tiny Arrow batches force the sequential state to survive batch
    boundaries mid-bucket."""
    docs = load_table(spark, SF, "documents")
    baseline = sorted(
        (r["doc_id"], r["pack_bin"])
        for r in pack_first_fit(docs, ctx_tokens=CTX, n_buckets=8).collect()
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        tiny = sorted(
            (r["doc_id"], r["pack_bin"])
            for r in pack_first_fit(docs, ctx_tokens=CTX, n_buckets=8).collect()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert tiny == baseline


def test_first_fit_packs_tighter_or_equal_to_streaming_concat(spark):
    """Sanity vs the SQL streaming-concat form: both assign every doc;
    first-fit opens at least as many bins (it refuses to straddle)."""
    from tfm_semisup_spark.queries.corpus_prep import pack_token_bins

    sql_bins = pack_token_bins(spark, SF).agg(F.count(F.lit(1))).head()[0]
    ff = pack_first_fit(
        load_table(spark, SF, "documents"), ctx_tokens=256, n_buckets=32
    )
    ff_bins = ff.select("pack_bucket", "pack_bin").distinct().count()
    assert ff_bins >= sql_bins * 0.5  # same order of magnitude

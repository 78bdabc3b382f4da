"""Streaming dedup smoke: readStream + memory sink, duplicates planted
within and across micro-batches (streaming/dedup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.streaming.dedup import (
    stream_exact_dedup,
    stream_new_docs_vs_corpus,
)
from tfm_semisup_spark.streaming.events import run_available_now


def _write_batches(spark, tmp_path):
    """Two parquet files -> two micro-batches. doc 2 duplicates doc 1
    in-batch; doc 11 duplicates doc 1 across batches (within the
    watermark horizon); doc 12 is fresh."""
    rows1 = [
        (1, "alpha beta gamma", "2024-01-01 10:00:00"),
        (2, "alpha beta gamma", "2024-01-01 10:05:00"),
        (3, "delta epsilon zeta", "2024-01-01 10:10:00"),
    ]
    rows2 = [
        (11, "alpha beta gamma", "2024-01-01 10:20:00"),
        (12, "eta theta iota", "2024-01-01 10:30:00"),
    ]
    src = str(tmp_path / "docs_src")
    for name, rows in (("part1", rows1), ("part2", rows2)):
        spark.createDataFrame(
            rows, "doc_id long, text string, ts_s string"
        ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").coalesce(
            1
        ).write.parquet(f"{src}/{name}")
    schema = spark.read.parquet(f"{src}/part1").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/part*")
    )


def test_stream_exact_dedup_bounded_state(spark, tmp_path):
    stream = _write_batches(spark, tmp_path)
    assert stream.isStreaming
    q = run_available_now(
        stream_exact_dedup(stream), "stream_dedup_out", output_mode="append"
    )
    assert len(q.recentProgress) >= 2, "expected multiple micro-batches"
    out = spark.table("stream_dedup_out").collect()
    kept_ids = sorted(r["doc_id"] for r in out)
    # one survivor per distinct text: 1 (first alpha...), 3, 12
    assert kept_ids == [1, 3, 12]
    # the state store must be keyed by fingerprint with watermark
    # cleanup — progress reports a bounded numRowsTotal
    state = q.lastProgress["stateOperators"][0]
    assert state["numRowsTotal"] <= 3


def test_stream_new_docs_vs_corpus(spark, tmp_path):
    known = spark.createDataFrame(
        [("alpha beta gamma",)], "text string"
    ).select(F.md5("text").alias("fp"))
    stream = _write_batches(spark, tmp_path)
    run_available_now(
        stream_new_docs_vs_corpus(stream, known),
        "stream_newdocs_out",
        output_mode="append",
    )
    kept_ids = sorted(
        r["doc_id"] for r in spark.table("stream_newdocs_out").collect()
    )
    # every alpha... doc (1, 2, 11) is already in the corpus
    assert kept_ids == [3, 12]


def test_inrow_signatures_equal_grouped_minhash(spark):
    """The stateless in-row signature (array_min over one-md5-per-gram
    digests) must be value-identical to the explode+groupBy MIN the
    portable batch tier and the oracle compute — the claim that makes
    streaming_neardup_minhash_ingest hash-checkable. Also guards the
    HOF two-parameter-lambda index trap (slices must differ)."""
    from pyspark.sql import functions as F

    from tfm_semisup_spark.functions.text import word_ngrams
    from tfm_semisup_spark.operators.layout import md5_uniform16_spark_sql
    from tfm_semisup_spark.queries.dedup import _MH_SLICES, _inrow_signatures

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inrow = {r["doc_id"]: tuple(r[f"m{j}"] for j in range(_MH_SLICES))
             for r in _inrow_signatures(docs).collect()}
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    grams = (
        docs.withColumn("w", toks)
        .select("doc_id", F.explode(word_ngrams(F.col("w"), 3)).alias("gram"))
    )
    grouped = {
        r["doc_id"]: tuple(r[f"m{j}"] for j in range(_MH_SLICES))
        for r in grams.groupBy("doc_id").agg(
            *[
                F.min(F.expr(md5_uniform16_spark_sql("md5(gram)", start=1 + 4 * j))).alias(f"m{j}")
                for j in range(_MH_SLICES)
            ]
        ).collect()
    }
    assert inrow == grouped and len(inrow) > 0
    # index-shadowing regression: slices of one doc must not all agree
    assert any(len(set(sig)) > 1 for sig in inrow.values())

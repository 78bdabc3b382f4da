"""Sources/sinks round-trips + text featurization pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.text_pipeline import build_text_pipeline
from tfm_semisup_spark.sources import (
    read_csv,
    read_delimited_text,
    read_json_lines,
    write_csv,
    write_partitioned_parquet,
)

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_with_infer_schema(spark, tmp_path):
    nation = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, header=True, infer_schema=True)
    assert sorted(back.columns) == sorted(nation.columns)
    assert back.count() == nation.count()
    assert dict(back.dtypes)["n_nationkey"] == "int"  # inferSchema worked
    assert {r["n_name"] for r in back.collect()} == {
        r["n_name"] for r in nation.collect()
    }


def test_delimited_text_parse_and_clean(spark, tmp_path):
    # reference pattern: raw lines, drop rows containing '?'
    raw = tmp_path / "raw.txt"
    raw.write_text("1,alice,30\n2,b?b,40\n3,carol,50\n\n")
    df = read_delimited_text(
        spark,
        str(raw),
        column_names=["id", "name", "age"],
        drop_malformed_containing="?",
    )
    rows = {r["id"]: (r["name"], r["age"]) for r in df.collect()}
    assert rows == {"1": ("alice", "30"), "3": ("carol", "50")}


def test_json_lines_roundtrip(spark, tmp_path):
    events = load_table(spark, SF, "events").limit(50)
    path = str(tmp_path / "events_json")
    events.select("event_id", "event_type", "value").write.mode("overwrite").json(path)
    back = read_json_lines(spark, path)
    assert back.count() == 50
    assert {r["event_id"] for r in back.collect()} == {
        r["event_id"] for r in events.collect()
    }


def test_partitioned_parquet_prunes(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned_parquet(orders, path, ["o_orderstatus"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: only files under o_orderstatus=F are read
    pruned = back.where(F.col("o_orderstatus") == "F").select(
        F.input_file_name().alias("f")
    )
    files = {r["f"] for r in pruned.distinct().collect()}
    assert files and all("o_orderstatus=F" in f for f in files)


def test_text_pipeline_tfidf(spark):
    docs = load_table(spark, SF, "documents")
    model = build_text_pipeline().fit(docs)
    out = model.transform(docs).select("doc_id", "tfidf")
    first = out.head()
    assert first["tfidf"].numNonzeros() > 0
    assert out.count() == docs.count()


def test_text_pipeline_bigrams(spark):
    docs = load_table(spark, SF, "documents")
    model = build_text_pipeline(ngram=2).fit(docs)
    out = model.transform(docs)
    assert out.head()["tfidf"].numNonzeros() > 0


def test_count_vectorizer_vocab_determinism_audit(spark):
    """ROADMAP audit: CountVectorizer's fitted vocabulary, across
    different input partitionings —
    - the vocab SET is stable when vocabSize does not truncate (and
      term indices are stable wherever counts are distinct);
    - truncation inside a tied-frequency band is NOT guaranteed stable,
      which is why every corpus path here uses stateless HashingTF and
      an explicit-vocab consumer must pre-aggregate + sort (count,
      term) itself.
    The test pins down the safe contract only."""
    from pyspark.ml.feature import CountVectorizer

    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    cv = CountVectorizer(inputCol="toks", outputCol="tf", vocabSize=1 << 18)
    vocab_by_partitioning = [
        cv.fit(docs.repartition(n, "doc_id")).vocabulary for n in (1, 7, 32)
    ]
    assert all(
        set(v) == set(vocab_by_partitioning[0]) for v in vocab_by_partitioning
    )
    # indices agree wherever the frequency is unique: compare the
    # (term -> index) maps restricted to distinct-count terms
    counts = (
        docs.select(F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dup_counts = {
        r["c"]
        for r in counts.groupBy("c")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .collect()
    }
    unique_terms = {
        r["t"] for r in counts.where(~F.col("c").isin(dup_counts)).collect()
    }
    maps = [
        {t: i for i, t in enumerate(v) if t in unique_terms}
        for v in vocab_by_partitioning
    ]
    assert maps[0] == maps[1] == maps[2]


def test_orc_round_trip_with_partition_pruning(spark, tmp_path):
    """ORC source/sink: values survive the round trip and a partition
    filter prunes to one directory (scan shows a single partition)."""
    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.sources import read_orc, write_partitioned_orc

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = str(tmp_path / "orders_orc")
    write_partitioned_orc(orders, out, ["o_orderstatus"])
    back = read_orc(spark, out)
    assert back.count() == orders.count()
    # column values survive (spot-check an aggregate)
    a = orders.agg(F.sum("o_totalprice")).head()[0]
    b = back.agg(F.sum("o_totalprice")).head()[0]
    assert abs(a - b) < 1e-6
    # partition pruning: the filtered scan reads one partition dir
    pruned = back.where(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() == orders.where(F.col("o_orderstatus") == "F").count()


def test_binary_file_source_reads_opaque_media(spark, tmp_path):
    """binaryFile ingest: one row per file, glob pruning at listing
    time, length cap without reading content, bytes round-trip."""
    from tfm_semisup_spark.sources import read_binary_files

    payloads = {"a.img": b"\x89FAKE" * 10, "b.img": b"\x00" * 2048, "c.txt": b"skip"}
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)

    df = read_binary_files(spark, str(tmp_path), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}
    assert bytes(rows["a.img"]["content"]) == payloads["a.img"]
    assert rows["b.img"]["length"] == 2048

    capped = read_binary_files(spark, str(tmp_path), glob="*.img", max_bytes=100)
    assert [r["path"].rsplit("/", 1)[-1] for r in capped.collect()] == ["a.img"]


def test_binary_source_feeds_multimodal_feature_kernel(spark, tmp_path):
    """Integration: the binaryFile source's (path, content) rows flow
    through the Arrow mapInPandas feature extractor — the real ingest
    half of the multimodal family (stand-in payloads elsewhere come
    from encoded text)."""
    from tfm_semisup_spark.operators.multimodal import extract_media_features
    from tfm_semisup_spark.sources import read_binary_files

    blobs = {f"m{i}.img": bytes([i]) * (100 + i) for i in range(4)}
    for name, blob in blobs.items():
        (tmp_path / name).write_bytes(blob)

    from pyspark.sql import functions as F

    media = read_binary_files(spark, str(tmp_path), glob="*.img").select(
        F.regexp_extract(
            F.col("path"), r"m(\d+)\.img$", 1
        ).cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    rows = {r["doc_id"]: r for r in extract_media_features(media).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for i in range(4):
        assert rows[i]["n_bytes"] == 100 + i
        assert rows[i]["checksum_mod"] == (i * 64) % 997

"""Multimodal plumbing check: binary payload column -> Arrow-batched
mapInPandas feature extraction (stubbed decode, real plumbing).

The oracle reproduces the stub's arithmetic relationally (corpus is
ASCII, so byte == character): proof the Python batch path is
deterministic and schema-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.multimodal import extract_media_features, with_binary_payload
from tfm_semisup_spark.queries import register

MULTIMODAL_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(list_sum(list_transform(generate_series(1, least(64, length(text))),
                                    i -> ord(substr(text, i, 1)))) AS BIGINT) % 997
         AS checksum_mod
FROM documents
"""


@register("multimodal_feature_stub", MULTIMODAL_ORACLE)
def multimodal_feature_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(with_binary_payload(docs))


# Frame/chunk sampling plumbing: one output row per fixed-size payload
# chunk (the shape of video frame-sampling / audio windowing), produced
# by an Arrow-batched mapInPandas; oracle reproduces the chunk geometry
# with generate_series.
CHUNKS_ORACLE = """
SELECT d.doc_id,
       CAST(t.i AS BIGINT) AS chunk_idx,
       CAST(least(100, octet_length(encode(d.text)) - t.i * 100) AS BIGINT) AS chunk_len
FROM documents d,
     UNNEST(generate_series(0, CAST(ceil(octet_length(encode(d.text)) / 100.0) AS BIGINT) - 1))
       AS t(i)
"""


@register("multimodal_chunk_sample", CHUNKS_ORACLE)
def multimodal_chunk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tfm_semisup_spark.operators.multimodal import sample_chunks

    docs = load_table(spark, sf_dir, "documents")
    return sample_chunks(with_binary_payload(docs), chunk_size=100)


# Resize/thumbnail plumbing: binary-out mapInPandas; the oracle checks
# the byte-exact contract on the lengths (the thumb bytes themselves
# are a prefix of the UTF-8 payload — substring-checkable, but DuckDB
# BLOB hex formatting differs from the driver's bytes repr, so the
# oracled columns are the numeric contract).
RESIZE_ORACLE = """
SELECT doc_id,
       CAST(least(octet_length(encode(text)), 256) AS BIGINT) AS thumb_bytes,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


@register("multimodal_resize_stub", RESIZE_ORACLE)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail pass over the corpus payloads: Arrow mapInPandas
    truncation stub (operators/multimodal.py::resize_media), joined
    back to the metadata struct for the original size — the
    decode-free slice of a real image-resize stage."""
    from tfm_semisup_spark.operators.multimodal import (
        resize_media,
        with_binary_payload,
    )

    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    thumbs = resize_media(docs, max_bytes=256)
    meta = docs.select("doc_id", F.col("media_meta.n_bytes").alias("n_bytes"))
    return thumbs.join(meta, "doc_id").select("doc_id", "thumb_bytes", "n_bytes")

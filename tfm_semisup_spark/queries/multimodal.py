"""Multimodal plumbing check: binary payload column -> Arrow-batched
mapInPandas feature extraction (stubbed decode, real plumbing).

The oracle reproduces the stub's arithmetic relationally (corpus is
ASCII, so byte == character): proof the Python batch path is
deterministic and schema-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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

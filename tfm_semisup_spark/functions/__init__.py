"""Columnar helper functions. Everything here is built from
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd) — no
row-at-a-time Python UDFs, per the 100 TB mandate (SURVEY.md §4).
"""

from tfm_semisup_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    prob_max,
)
from tfm_semisup_spark.functions.geo import haversine_km  # noqa: F401
from tfm_semisup_spark.functions.text import (  # noqa: F401
    char_ngrams,
    token_count,
    whitespace_tokens,
    word_ngrams,
)

"""tfm_semisup_spark — PySpark-native semi-supervised learning + data-processing engine.

A from-scratch rebuild of the capabilities of Dguipla/TFM-SemiSup
(a Scala Spark ML semi-supervised classification library) as an
idiomatic PySpark package, extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed
for 100 TB scale.

Layout:
    session      -- SparkSession factory with scale-oriented defaults
    io           -- parquet table loaders for the test star schema
    functions/   -- columnar helpers (vector, geo, text); no Python UDFs
    operators/   -- SSC estimators/transformers (SelfTraining, CoTraining, ...)
    queries/     -- named DataFrame queries + DuckDB oracle SQL registry
"""

__version__ = "0.1.0"

"""Sources & sinks beyond the harness parquet (SURVEY.md §2.2 scans).

The reference ingests data two ways:
- CSV with sep/header/inferSchema options
  (``SemiSupervisedAndBaseClassifiers.scala:53-57``,
  ``BaseClassifiers.scala:250-254``) -> ``read_csv``;
- raw text via ``sc.textFile`` + manual split/clean, with header skip
  via ``zipWithIndex`` (``:276,525,801,825``) -> ``read_delimited_text``
  re-expresses that WITHOUT RDDs: ``spark.read.text`` + columnar
  split/filter, so the parse stays inside Catalyst (predicate pushdown,
  codegen) instead of opaque Python/Scala closures.

Sinks: the reference only display()s results; a real engine needs
durable writes — ``write_partitioned_parquet`` demonstrates the 100 TB
layout discipline (partition column -> directory pruning for readers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    infer_schema: bool = True,
    schema: StructType | None = None,
) -> DataFrame:
    """CSV scan with the reference's option set. Note inferSchema costs
    an extra full pass — at scale pass an explicit ``schema``."""
    reader = spark.read.option("sep", sep).option("header", header)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", infer_schema).csv(path)


def read_delimited_text(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    column_names: list[str] | None = None,
    drop_malformed_containing: str | None = None,
) -> DataFrame:
    """Raw-text ingestion without RDDs.

    Re-expression of the reference's textFile->split->filter cleaning
    (e.g. dropping '?'-containing rows, ``SemiSupervisedAndBaseClassifiers
    .scala:287``): everything is a column expression, so Catalyst can
    pipeline it into the scan.
    """
    lines = spark.read.text(path).where(F.col("value") != "")
    if drop_malformed_containing is not None:
        lines = lines.where(~F.col("value").contains(drop_malformed_containing))
    parts = F.split("value", sep)
    if column_names is None:
        return lines.select(parts.alias("fields"))
    return lines.select(
        *[parts.getItem(i).alias(name) for i, name in enumerate(column_names)]
    )


def read_json_lines(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned columnar sink: readers prune directories on the
    partition column (verified by test via input_file_name)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", header).csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the second columnar lake format Spark supports
    natively. Same engine benefits as parquet (column pruning,
    predicate pushdown to row-group stripes, vectorized reader via
    ``spark.sql.orc.impl=native``); useful when the upstream lake is
    Hive-era ORC rather than parquet."""
    return spark.read.orc(path)


def write_partitioned_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Partitioned ORC sink, mirroring ``write_partitioned_parquet``'s
    directory-pruning layout discipline."""
    df.write.partitionBy(*partition_cols).mode(mode).orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Opaque-media source (``binaryFile`` format): one row per file
    with (path, modificationTime, length, content binary) — the
    ingest half of the multimodal family (operators/multimodal.py
    processes the ``content`` column with Arrow ``mapInPandas``
    kernels; decode itself is stubbed, container has no media libs).

    100 TB notes: the format computes per-file splits up front, so a
    directory of millions of images parallelizes by file;
    ``pathGlobFilter`` prunes non-media files at listing time (never
    reads them), and ``spark.sql.files.maxPartitionBytes`` groups
    small files per task. ``max_bytes`` guards executor memory: each
    row materializes a whole file, so cap and filter upstream of any
    wide transformation (a length predicate is served by the file
    LISTING, not by reading content)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df

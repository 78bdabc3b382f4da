"""Shuffle-avoidance utilities: bucketed co-located joins and salted
skew joins (SCALE.md; the knobs a 100 TB deployment actually turns).

- Bucketing: pre-shuffle both tables ONCE at write time
  (``bucketBy(n, key)`` + ``saveAsTable``); every subsequent equi-join
  or aggregation on the key runs with NO Exchange — verified by plan
  assertion in tests. This is how repeated fact-fact joins amortize
  their shuffle at scale.

- Salting: for skewed keys, split each hot key into ``num_salts``
  sub-keys — the left side gets a deterministic salt, the right side is
  replicated per salt value. Trades a bounded row-replication of the
  small side for an even task distribution. (AQE skew-join handles
  moderate skew automatically; salting is for the pathological tail.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed parquet table.

    Idempotent across sessions: with the in-memory catalog, a previous
    process's managed-table directory survives while the catalog entry
    does not, and saveAsTable then fails with LOCATION_ALREADY_EXISTS —
    so drop the table AND clear a stale location first.
    """
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse_uri = spark.conf.get("spark.sql.warehouse.dir")
    scheme = urlparse(warehouse_uri).scheme
    if scheme in ("", "file"):
        # managed-table layout: default db -> <warehouse>/<table>;
        # qualified 'db.table' -> <warehouse>/<db>.db/<table>
        warehouse = urlparse(warehouse_uri).path
        parts = table_name.lower().split(".")
        rel = parts[-1] if len(parts) == 1 else f"{parts[-2]}.db/{parts[-1]}"
        shutil.rmtree(f"{warehouse}/{rel}", ignore_errors=True)
    # non-local warehouses (hdfs/s3): DROP TABLE is the only cleanup we
    # can do from here; a stale location then still fails saveAsTable
    # loudly rather than being silently half-cleaned
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_key)
        .sortBy(bucket_key)
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans a SortMergeJoin with zero Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    # merge hint: keep it an SMJ so the bucket layout (not a broadcast)
    # is what avoids the shuffle — the property being relied on at scale.
    # DataFrame-qualified key refs: unqualified F.col would be ambiguous
    # whenever both tables use the same key column name.
    return left.hint("merge").join(right, left[left_key] == right[right_key])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side,
    replicate the right side across salt values, join on (key, salt).

    Result rows are identical to the plain equi-join; only the physical
    distribution changes. The left salt is derived from xxhash64 of all
    left columns, so it is deterministic yet spreads a hot key evenly.
    """
    left_salted = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts)),
    )
    right_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = left_salted.join(
        right_replicated,
        (left_salted[left_key] == right_replicated[right_key])
        & (left_salted["__salt"] == right_replicated["__salt"]),
    )
    return joined.drop("__salt")

"""Named query registry.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` registered
under a stable name; SQL-expressible queries also register an ANSI-SQL
oracle string that DuckDB runs over the same parquet tables
(driver contract in ``__spark_entry__.py``).

Output conventions (required for the driver's order-insensitive
value-hash compare):
- every computed column is explicitly aliased, identically in both the
  DataFrame code and the oracle SQL;
- floating-point aggregates are ``round``-ed (2-6 dp) on BOTH sides so
  engine-level summation-order ULP differences can't flip the hash;
- integer-valued derived columns are cast to BIGINT on both sides
  (Spark month() is int32, DuckDB sum(int) is HUGEINT, ...);
- timestamps in outputs are formatted as strings to dodge
  datetime64[ns]-vs-[us] dtype differences.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_queries() -> None:
    """Import every query module so registration side effects run."""
    from tfm_semisup_spark.queries import relational  # noqa: F401
    from tfm_semisup_spark.queries import relational2  # noqa: F401
    from tfm_semisup_spark.queries import relational3  # noqa: F401
    from tfm_semisup_spark.queries import relational4  # noqa: F401
    from tfm_semisup_spark.queries import relational5  # noqa: F401
    from tfm_semisup_spark.queries import relational6  # noqa: F401
    from tfm_semisup_spark.queries import tpch_shapes  # noqa: F401
    from tfm_semisup_spark.queries import dedup  # noqa: F401
    from tfm_semisup_spark.queries import similarity  # noqa: F401
    from tfm_semisup_spark.queries import text_analysis  # noqa: F401
    from tfm_semisup_spark.queries import windows  # noqa: F401
    from tfm_semisup_spark.queries import multimodal  # noqa: F401
    from tfm_semisup_spark.queries import ssl_queries  # noqa: F401

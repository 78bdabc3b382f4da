"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-schema query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
named ``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` maps
each SQL-expressible query name to the equivalent DuckDB SQL. Rows-only
(non-SQL) entries — the ML training ops — have no oracle entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tfm_semisup_spark.queries import ORACLES, QUERIES, load_all_queries

load_all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_regional_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

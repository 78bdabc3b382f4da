"""As-of (nearest-prior) join — a custom operator Spark lacks natively.

Composed from existing DataFrame ops (the preferred strategy for custom
operators, per the engine's design rules): tag both sides, UNION, and
carry the most recent right-side payload forward with
``last(ignorenulls=True)`` over a per-key event-time window. One
shuffle+sort per key — no range join, no per-row subquery. At 100 TB
this is the classic scalable formulation: the union shuffles
O(|L|+|R|) rows once, and the window sort is per-key.

Ties: right rows sort BEFORE left rows at equal timestamps (backward
as-of includes same-instant matches). Right-side duplicates at the same
(key, time) should be pre-aggregated by the caller for deterministic
output (DuckDB's native ASOF JOIN has the same caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """left + most-recent right values with right_time <= left_time.

    Returns all left columns plus ``value_cols`` (null when no prior
    right row exists for the key).
    """
    left_cols = left.columns
    # the right payload is carried as ONE struct: carrying columns
    # independently with last(ignorenulls) would stitch values from
    # DIFFERENT right rows whenever a value column contains NULL (the
    # null padding and genuine right-side NULLs would be conflated)
    right_struct_type = (
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        ) + ">"
    )
    tagged_left = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(right_struct_type).alias("__rv"),
    )
    tagged_right = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left",
        *[F.col(c) for c in left_cols],
        F.last("__rv", ignorenulls=True).over(w).alias("__rv"),
    )
    return (
        carried.where(F.col("__is_left") == 1)
        .select(
            *[F.col(c) for c in left_cols],
            *[F.col(f"__rv.{c}").alias(c) for c in value_cols],
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """left + EARLIEST-following right values with right_time >=
    left_time — the mirror of ``asof_join_backward`` (same union +
    per-key window formulation, same single shuffle).

    Ties: right rows at the SAME instant are eligible (forward as-of
    includes same-instant matches), so at equal timestamps left rows
    sort before right rows and the frame runs current row ->
    unbounded following with ``first(ignorenulls)``. The backward
    variant's caveat applies unchanged: pre-aggregate right-side
    duplicates at the same (key, time) for deterministic payloads.
    """
    left_cols = left.columns
    right_struct_type = (
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        ) + ">"
    )
    tagged_left = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(right_struct_type).alias("__rv"),
    )
    tagged_right = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "__is_left",
        *[F.col(c) for c in left_cols],
        F.first("__rv", ignorenulls=True).over(w).alias("__rv"),
    )
    return (
        carried.where(F.col("__is_left") == 1)
        .select(
            *[F.col(c) for c in left_cols],
            *[F.col(f"__rv.{c}").alias(c) for c in value_cols],
        )
    )

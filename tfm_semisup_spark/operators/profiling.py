"""Column profiling: per-column completeness / cardinality / extrema
in ONE scan — the "what is in this table" primitive that precedes
constraint authoring (queries/expectations.py holds the enforcement
half; reference parity: the reference profiles its datasets ad hoc in
notebook cells, e.g. class counts in ``SelfTraining.scala`` training
loops — this is that surface as a reusable operator).

100 TB design: one aggregation pass computes every statistic for every
profiled column (count/non-null/min/max are plain aggregates;
``count_distinct`` over k columns plans as a k-way Expand before ONE
exchange — k× map-side rows, still a single scan and shuffle). The
long-form reshape afterwards is driver-side over k rows. For
approximate profiling at extreme cardinalities swap
``approx_count_distinct`` in (same plan, no Expand); the exact form is
the default because the DuckDB oracle can mirror it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fmt(col: Column, dtype: str) -> Column:
    """Portable string rendering for min/max: fixed 4-dp for floats
    (finer than the 2-dp money data — Spark/DuckDB double->string
    representations differ), ISO seconds for timestamps, plain cast
    otherwise."""
    if dtype in ("double", "float"):
        return F.format_string("%.4f", col)
    if dtype.startswith("timestamp") or dtype == "date":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_columns(
    df: DataFrame, cols: list[str], approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """Long-form profile: one row per column —
    (col_name, n_rows, n_nonnull, n_distinct, min_value, max_value),
    min/max rendered as portable strings. Single aggregation pass.

    ``approx=True`` swaps exact ``count_distinct`` for
    ``approx_count_distinct`` (HyperLogLog++, relative sd ``rsd``) —
    same single scan but WITHOUT the k-way Expand the exact form plans,
    so at extreme cardinalities the map-side row blowup disappears. The
    HLL sketch merge is commutative/associative, so the estimate is
    deterministic and partitioning-insensitive (rows-only registry
    contract)."""
    dtypes = dict(df.dtypes)
    nd = (
        (lambda c: F.approx_count_distinct(c, rsd))
        if approx
        else F.count_distinct
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            _fmt(F.min(c), dtypes[c]).alias(f"__min_{c}"),
            _fmt(F.max(c), dtypes[c]).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("__n").cast("bigint").alias("n_rows"),
                        F.col(f"__nn_{c}").cast("bigint").alias("n_nonnull"),
                        F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_value"),
                        F.col(f"__max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")

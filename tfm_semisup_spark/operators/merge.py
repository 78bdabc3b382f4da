"""SCD1 merge/upsert: apply a change set to a target relation —
updates win on key match, unmatched updates insert, unmatched target
rows pass through. The DataFrame re-expression of ``MERGE INTO``
(Delta/Iceberg) for plain-parquet pipelines; the SCD2 history twin
lives in queries/relational7.py::order_history_scd2.

100 TB design: ONE full-outer shuffle join keyed on the merge key —
both sides hash-partition on the key, so the merge parallelizes per
key range and AQE handles a skewed key. No window, no driver state.
The action column is computed from null-ness of each side's key (and
a value comparison for matched rows), so change detection costs no
extra pass. At petabyte scale the same plan applies per partition
(run it under dynamic partition overwrite to rewrite only affected
partitions — see operators/rollup_table.py for that write pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Merged relation with a ``__merge_action`` column in
    {'inserted', 'updated', 'unchanged'}. Update rows win column-wise
    on key match; ``compare_cols`` (default: all non-key columns the
    sides share) decide updated-vs-unchanged for matched keys.

    Preconditions (ADVICE r5): the merge key must be UNIQUE within
    ``updates`` (a duplicate update key fans target rows out through
    the full-outer join — classic MERGE engines reject this as a
    cardinality violation) and NON-NULL on both sides (the presence
    probes below classify a row by ``isNotNull`` of its first key
    part). ``compare_cols`` must be a subset of the value columns both
    sides share — that is validated eagerly here; key uniqueness/
    non-nullness are data properties the caller owns (checking them
    would cost an extra full pass per merge at 100 TB — run
    ``queries/expectations.py`` constraint audits upstream instead).
    """
    value_cols = [c for c in target.columns if c not in key_cols]
    shared = [c for c in value_cols if c in updates.columns]
    if compare_cols is None:
        compare_cols = shared
    else:
        bad = [c for c in compare_cols if c not in shared]
        if bad:
            raise ValueError(
                f"compare_cols {bad} not value columns shared by both "
                f"sides (shared: {shared})"
            )

    t = target.select(
        *[F.col(k).alias(f"__tk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__t_{c}") for c in value_cols],
    )
    u = updates.select(
        *[F.col(k).alias(f"__uk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__u_{c}") for c in shared],
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__tk_{k}") == F.col(f"__uk_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = t.join(u, cond, "full_outer")

    in_target = F.col(f"__tk_{key_cols[0]}").isNotNull()
    in_updates = F.col(f"__uk_{key_cols[0]}").isNotNull()

    def changed() -> Column:
        c = F.lit(False)
        for col in compare_cols:
            # null-safe inequality so NULL -> value counts as a change
            c = c | ~F.col(f"__t_{col}").eqNullSafe(F.col(f"__u_{col}"))
        return c

    action = (
        F.when(~in_target, F.lit("inserted"))
        .when(in_updates & changed(), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    out_key = [
        F.coalesce(F.col(f"__tk_{k}"), F.col(f"__uk_{k}")).alias(k)
        for k in key_cols
    ]
    out_val = [
        (
            F.when(
                in_updates, F.col(f"__u_{c}")
            ).otherwise(F.col(f"__t_{c}")).alias(c)
            if c in shared
            else F.col(f"__t_{c}").alias(c)
        )
        for c in value_cols
    ]
    return joined.select(*out_key, *out_val, action.alias("__merge_action"))

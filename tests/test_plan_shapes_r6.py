"""Round-6 plan/behavior pins: approx profiling tier error bound and
plan shape (no Expand), streaming artifact tiers' determinism."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_profile_approx_within_rsd(spark):
    """Approx tier: identical n_rows/n_nonnull/extrema, n_distinct
    within a generous 3x the configured relative sd of the exact tier,
    and deterministic across runs (rows-only registry contract)."""
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    exact = {
        r["col_name"]: r
        for r in QUERIES["profile_orders_columns"](spark, SF_DIR).collect()
    }
    approx_rows = QUERIES["profile_orders_columns_approx"](spark, SF_DIR).collect()
    approx = {r["col_name"]: r for r in approx_rows}
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        for col in ("n_rows", "n_nonnull", "min_value", "max_value"):
            assert a[col] == e[col], (c, col)
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            1, 3 * 0.05 * e["n_distinct"]
        ), (c, a["n_distinct"], e["n_distinct"])
    rerun = QUERIES["profile_orders_columns_approx"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rerun)) == sorted(map(tuple, approx_rows))


def test_profile_approx_plan_has_no_expand(spark):
    """The exact tier pays a k-way Expand for multi-column
    count_distinct; the approx tier must not (that is its point at
    extreme cardinality)."""
    from tfm_semisup_spark.io import load_table
    from tfm_semisup_spark.operators.profiling import profile_columns

    orders = load_table(spark, SF_DIR, "orders")
    cols = ["o_custkey", "o_orderstatus"]
    exact_plan = profile_columns(orders, cols)._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile_columns(orders, cols, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan

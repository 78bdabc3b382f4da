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


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_triangle_plan_all_equi_joins(spark):
    """Oriented triangle enumeration must compile to hash equi-joins —
    a CartesianProduct would mean the orientation predicate leaked out
    of the join keys."""
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    plan = _plan(QUERIES["item_triangle_counts"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_logppl_plan_no_cartesian_no_python(spark):
    """Unigram LM scoring stays JVM-side: the single-row total rides a
    broadcast, never a CartesianProduct; no Python workers anywhere."""
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    plan = _plan(QUERIES["text_unigram_logppl"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_bmp_decode_plan_is_narrow(spark):
    """encode -> decode is two chained Arrow stages over the scan —
    zero Exchange (shuffle) in the whole plan."""
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    plan = _plan(QUERIES["multimodal_bmp_decode_stats"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 2


def test_mad_plan_broadcasts_stats_back(spark):
    """The per-type median/MAD relations are value-domain-bounded and
    must broadcast back against the fact scan — a SortMergeJoin here
    would shuffle the events table twice for a handful of stats
    rows."""
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    plan = _plan(QUERIES["robust_outlier_mad"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_streaming_dedup_artifact_deterministic(spark):
    """The ingest-dedup artifact projects only fingerprint-determined
    columns, so two independent micro-batch runs must agree exactly."""
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    q = QUERIES["streaming_dedup_finalized"]
    a = sorted(map(tuple, q(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0


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

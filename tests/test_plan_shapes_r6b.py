"""Round-6 plan pins for the late-round additions (stats2 /
text_analysis2 / graph2 / semantic screen): the scale-critical plan
properties each query's design notes claim."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(spark, name):
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    return QUERIES[name](spark, SF_DIR)


def test_ewma_plan_no_window_no_smj(spark):
    """The EWMA is a contribution explode + hash aggregate: no window
    operator (the naive sliding form) and no sort-merge join (the
    naive non-equi self-join form) may appear; the max-day cut rides a
    broadcast."""
    plan = _plan(_q(spark, "ewma_daily_revenue"))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ewma_weighted_sum_is_integer_typed(spark):
    """The order-independence argument rests on the weighted sum being
    BIGINT end-to-end: the aggregate's sum input must be long, with the
    double division applied only after."""
    df = _q(spark, "ewma_daily_revenue")
    assert dict(df.dtypes) == {"day": "string", "ewma_cents": "double"}
    # the exactness property itself: identical results at 1 vs 32
    # shuffle partitions would be probabilistic under double summation,
    # certain under integer summation
    a = sorted(map(tuple, df.collect()))
    one = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    df.sparkSession.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        b = sorted(map(tuple, _q(df.sparkSession, "ewma_daily_revenue").collect()))
    finally:
        df.sparkSession.conf.set("spark.sql.shuffle.partitions", one)
    assert a == b


def test_pmi_plan_no_token_window(spark):
    """Bigrams are built in-row (zip_with) — a Window over the exploded
    token stream (the posexplode+LEAD formulation) must not appear; the
    marginal joins ride broadcasts."""
    plan = _plan(_q(spark, "text_bigram_pmi"))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_boolean_search_filters_before_shuffle(spark):
    """The exploded token stream must be filtered to the query
    vocabulary BEFORE the (doc, term) aggregate's shuffle: the filter
    sits under Generate's parent projection, and the queries table
    joins as a broadcast."""
    plan = _plan(_q(spark, "text_boolean_and_search"))
    assert "BroadcastHashJoin" in plan
    # the vocabulary IN-filter runs pre-aggregation (pushed against the
    # generate output), so the first Exchange's input is already
    # term-filtered: no full-token-stream shuffle exists
    gen_idx = plan.index("Generate")
    filt_idx = plan.index("term#")
    assert filt_idx < len(plan) and gen_idx < len(plan)
    assert plan.count("Exchange") <= 4


def test_kcore_rounds_checkpoint_and_semi_join(spark):
    """Each peel round materializes into a checkpoint (O(1) lineage:
    the RETURNED plan is only the degree aggregate over the final
    checkpointed edge scan — every join already executed), and the
    round construction itself prunes edges with LeftSemi joins, pinned
    on a round plan built the same way the operator builds it."""
    plan = _plan(_q(spark, "item_kcore_membership"))
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # rounds ran eagerly, O(1) lineage
    assert "ExistingRDD" in plan or "LocalTableScan" in plan

    from pyspark.sql import functions as F

    from tfm_semisup_spark.queries.analytics import _cooc_pairs
    from tfm_semisup_spark.queries.graph2 import _KCORE_K, _KCORE_MIN_USERS

    edges = (
        _cooc_pairs(spark, SF_DIR)
        .where(F.col("n_users") >= _KCORE_MIN_USERS)
        .select("item_a", "item_b")
        .localCheckpoint()
    )
    keep = (
        edges.select(F.col("item_a").alias("item"))
        .unionAll(edges.select(F.col("item_b").alias("item")))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") >= _KCORE_K)
        .select("item")
    )
    nxt = edges.join(keep, edges.item_a == keep.item, "left_semi").join(
        keep, F.col("item_b") == keep.item, "left_semi"
    )
    round_plan = nxt._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in round_plan
    assert "CartesianProduct" not in round_plan


def test_semantic_screen_is_broadcast_probe(spark):
    """The benchmark side rides a broadcast into the corpus scan (zero
    corpus shuffle before the aggregate); the cosine stays in codegen —
    no Python workers, no interpreted HOF aggregate."""
    plan = _plan(_q(spark, "semantic_contamination_screen"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_mi_window_runs_over_aggregate(spark):
    """The MI marginal windows must consume the contingency-table
    AGGREGATE (15 rows), not fact rows: every Window in the plan sits
    above the HashAggregate pair."""
    plan = _plan(_q(spark, "mi_status_priority"))
    agg_first = plan.rindex("HashAggregate")
    win_first = plan.index("Window")
    # in executedPlan text, children print BELOW parents; the deepest
    # (first-executed) HashAggregate must appear AFTER the Window nodes
    assert win_first < agg_first


def test_ols_single_aggregation_pass(spark):
    """Groupwise OLS is ONE aggregation over the joined fact table —
    no window, no self-join of aggregates."""
    plan = _plan(_q(spark, "per_nation_price_trend_ols"))
    assert "Window" not in plan


def test_hll_single_pass_broadcast(spark):
    """Portable HLL: register aggregate + single-row exact count meet
    on broadcasts; no sort-merge join, no Python workers."""
    plan = _plan(_q(spark, "hll_portable_distinct"))
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_target_encode_windows_over_grid(spark):
    """Out-of-fold encoding: every Window consumes the fold x category
    AGGREGATE (executedPlan prints children below parents, so the
    deepest HashAggregate appears after the Window nodes)."""
    plan = _plan(_q(spark, "target_encode_priority"))
    assert plan.index("Window") < plan.rindex("HashAggregate")


def test_pit_join_no_cartesian(spark):
    """Point-in-time interval join stays keyed on custkey — the
    containment predicate must not leak into a CartesianProduct."""
    plan = _plan(_q(spark, "point_in_time_order_state"))
    assert "CartesianProduct" not in plan


def test_asof_forward_single_union_window(spark):
    """Forward as-of: union + ONE per-key window — no joins at all in
    the operator's plan (the scalable as-of formulation)."""
    plan = _plan(_q(spark, "asof_forward_next_order"))
    assert "CartesianProduct" not in plan
    assert plan.count("Window") == 1
    assert "Union" in plan


def test_vocab_id_broadcast_map(spark):
    """Tokenize-to-ids: the id map joins the exploded stream as a
    broadcast; no sort-merge join of the token stream."""
    plan = _plan(_q(spark, "vocab_id_stats"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_funnel3_user_keyed_steps(spark):
    """Three-step funnel: conversion probes are user-keyed hash joins
    (the time bounds filter in place); final rates ride broadcasts of
    single-row counts."""
    plan = _plan(_q(spark, "funnel_three_step"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # single-row rate combine

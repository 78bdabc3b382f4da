"""Physical-plan assertions for the round-4 queries — pins the
properties the 100 TB design argument rests on (pushdown reaching the
scan, joins staying hash/broadcast, the Levenshtein filter evaluated a
bounded number of times) so a refactor can't silently regress them."""

from __future__ import annotations

from tfm_semisup_spark.queries import QUERIES, load_all_queries

SF = "/root/testdata/sf0.001"

load_all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _plan_formatted(df) -> str:
    """Formatted mode — toString() truncates long filter lists."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q6_predicates_reach_the_scan(spark):
    """The canonical pushdown probe: every predicate in PushedFilters,
    only the 4 referenced columns read."""
    plan = _plan_formatted(QUERIES["q6_forecast_revenue"](spark, SF))
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount",
        "LessThanOrEqual(l_discount",
        "LessThan(l_quantity",
    ):
        assert frag in pushed, frag
    schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert schema.count(":") == 4, schema  # 4 columns, no more


def test_q5_snowflake_broadcasts_all_dims(spark):
    plan = _plan(QUERIES["q5_local_supplier_volume"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # supplier/nation/region


def test_q21_runs_no_correlated_self_joins(spark):
    """The per-order distinct-count formulation: plain hash joins and
    aggregates only — the textbook EXISTS/NOT-EXISTS pair would add
    two extra fact-fact joins."""
    plan = _plan(QUERIES["q21_waiting_suppliers"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_editdist_levenshtein_count_and_join_shape(spark):
    """The block join must stay a hash join (equi keys extracted, the
    id1<id2 condition as residual), and the threshold-Levenshtein must
    appear at most twice (join residual + projection) — the BETWEEN
    form re-evaluated it three times per pair (SCALE.md r4)."""
    plan = _plan(QUERIES["dedup_editdist_pairs"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("levenshtein") <= 2, plan.count("levenshtein")


def test_bm25_filters_tokens_before_any_exchange(spark):
    """The exploded-token filter to the query vocabulary must run
    scan-side — BELOW every Exchange on the path to the documents
    scan — so posting lists for non-query terms never shuffle. The
    toString tree is pre-order (children after parents), so in the
    text between the LAST Exchange preceding the documents scan and
    the scan itself, the vocab filter must appear."""
    plan = _plan(QUERIES["text_bm25_topk"](spark, SF))
    # locate the documents-table scans; at least one must have the
    # vocab filter between the nearest enclosing Exchange and itself
    ok = False
    for m in __import__("re").finditer(r"FileScan parquet \[doc_id", plan):
        prefix = plan[: m.start()]
        last_ex = prefix.rfind("Exchange")
        seg = prefix[last_ex:] if last_ex != -1 else prefix
        if "IN (spark,join,hash)" in seg:
            ok = True
            break
    assert ok, "vocab filter not found scan-side of any documents scan"


def test_funnel_conversion_is_user_keyed_join(spark):
    plan = _plan(QUERIES["funnel_view_purchase"](spark, SF))
    # the event-to-event conversion probe must be a HASH join keyed on
    # user (time window as residual); the only nested-loop join allowed
    # is the final 1-row x 1-row counters cross
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert any(
        "BroadcastHashJoin" in line and "user_id" in line
        for line in plan.splitlines()
    )


def test_gap_fill_scaffold_is_not_a_scan(spark):
    """The dense hour scaffold comes from sequence+explode over a
    1-row range — exactly one parquet scan (the counts side) in the
    whole plan."""
    plan = _plan(QUERIES["timeseries_gap_fill"](spark, SF))
    assert plan.count("Scan parquet") == 1
    assert "Range (0, 1" in plan

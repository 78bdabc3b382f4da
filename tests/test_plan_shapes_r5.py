"""Physical-plan assertions for the late-round-4 surface (boilerplate /
bloom / sampling / graph / TPC-H Q2-Q11-Q20 battery): pins the scale
properties the design docstrings claim, so refactors can't silently
regress them."""

from __future__ import annotations

from tfm_semisup_spark.queries import QUERIES, load_all_queries
from tests.conftest import SF_DIR as SF

load_all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_reservoir_is_one_stage_topk(spark):
    """A-Res sampling must be TakeOrderedAndProject (per-partition
    heaps + k-row driver merge) with ZERO exchanges — no global sort,
    no shuffle of the corpus."""
    plan = _plan(QUERIES["weighted_reservoir_sample"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Sort " not in plan


def test_label_centroid_stats_runs_joinless(spark):
    """The E||x-c||^2 = E||x||^2 - ||c||^2 identity: pure aggregation,
    no centroid-to-vector join anywhere in the plan."""
    plan = _plan(QUERIES["label_centroid_stats"](spark, SF))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_partsupp_battery_join_shapes(spark):
    """Q2/Q11/Q20 analogs: hash joins only — no cartesian products or
    nested-loop fallbacks from the decorrelated subqueries."""
    for name in (
        "q2_min_cost_supplier",
        "q11_important_stock",
        "q20_excess_availability",
    ):
        plan = _plan(QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        # Q11's scalar-total HAVING is a ONE-ROW broadcast cross join —
        # BroadcastNestedLoopJoin over a single-row build side is the
        # correct plan for it (the probe side streams once past one
        # row). Anything beyond that one is a regression.
        limit = 1 if name == "q11_important_stock" else 0
        assert plan.count("BroadcastNestedLoopJoin") <= limit, name


def test_new_corpus_queries_stay_jvm_side(spark):
    """No row-at-a-time Python anywhere in the new corpus surface."""
    for name in (
        "boilerplate_line_removal",
        "bloom_contamination_screen",
        "tfidf_top_terms",
        "source_drift_jsd",
        "attribution_last_touch",
        "item_cooccurrence_topk",
    ):
        plan = _plan(QUERIES[name](spark, SF))
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_bm25_workload_shape_and_ranks(spark):
    """Workload BM25 (r5): stays JVM-side; the only nested-loop join is
    the single-row stats cross join; output is a dense 1..5 ranking
    per query with scores non-increasing."""
    df = QUERIES["text_bm25_workload_topk"](spark, SF)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    rows = df.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["bm25"]))
    assert set(by_q) == {"q1", "q2", "q3"}
    for ranked in by_q.values():
        ranked.sort()
        assert [r for r, _ in ranked] == list(range(1, len(ranked) + 1))
        scores = [s for _, s in ranked]
        assert scores == sorted(scores, reverse=True)


def test_bm25_workload_matches_adhoc_single_query(spark):
    """The precomputed-stats path must score identically to the ad-hoc
    plan: q1 uses the exact term set of text_bm25_topk, so its top-5
    (doc_id, bm25) must equal the ad-hoc query's first 5 rows."""
    adhoc = [
        (r["doc_id"], r["bm25"])
        for r in QUERIES["text_bm25_topk"](spark, SF).collect()[:5]
    ]
    wl = sorted(
        (r["rank"], r["doc_id"], r["bm25"])
        for r in QUERIES["text_bm25_workload_topk"](spark, SF)
        .where("query_id = 'q1'")
        .collect()
    )
    assert [(d, s) for _, d, s in wl] == adhoc


def test_attribution_is_single_window_pass(spark):
    """Last-touch attribution: one window over user_id, no self-join —
    exactly one exchange ahead of the window sort."""
    plan = _plan(QUERIES["attribution_last_touch"](spark, SF))
    assert "Window" in plan
    assert "Join" not in plan


def test_portable_minhash_estimates_track_exact_jaccard(spark):
    """Every >= 6/8-coordinate pair must be a genuine near-dup: its
    exact word-3-gram Jaccard should be high (planted dups), and the
    estimate is a valid fraction. Also: no Python, no cartesian."""
    df = QUERIES["dedup_minhash_portable_pairs"](spark, SF)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows, "expected planted near-dup pairs at sf0.001"
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["dedup_ngram_jaccard_pairs"](spark, SF).collect()
    }
    for r in rows:
        assert 0.75 <= r["est_sim"] <= 1.0
        # banding recalls a pair only if some band matches exactly; at
        # >=6/8 agreement the underlying Jaccard is high — planted
        # dups in the synthetic corpus sit near 1.0
        assert exact.get((r["id1"], r["id2"]), 0.0) >= 0.5


def test_q15_no_global_sort_window(spark):
    """The Q15 winner selection must not plan an unpartitioned window
    sort (SF-linear input at scale): checkpointed aggregate + scalar
    max broadcast instead."""
    df = QUERIES["q15_top_supplier"](spark, SF)
    plan = _plan(df)
    assert "Window" not in plan
    rows = df.collect()
    assert len(rows) >= 1


def test_yoy_growth_first_year_sentinel(spark):
    rows = QUERIES["nation_yoy_revenue_growth"](spark, SF).collect()
    assert rows
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["n_name"], []).append((r["o_year"], r["yoy_growth"]))
    for series in by_nation.values():
        series.sort()
        assert series[0][1] == -999.0  # first year has no prior
        assert all(g != -999.0 for _, g in series[1:])


def test_profile_columns_counts_nulls_and_distincts(spark):
    """profile_columns: nulls excluded from n_nonnull/n_distinct, one
    row per profiled column, extrema rendered as strings."""
    from tfm_semisup_spark.operators.profiling import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.505), (3, "a", None), (4, "b", 2.505)],
        "id bigint, cat string, val double",
    )
    rows = {r["col_name"]: r for r in profile_columns(df, ["cat", "val"]).collect()}
    assert set(rows) == {"cat", "val"}
    c, v = rows["cat"], rows["val"]
    assert (c["n_rows"], c["n_nonnull"], c["n_distinct"]) == (4, 3, 2)
    assert (c["min_value"], c["max_value"]) == ("a", "b")
    assert (v["n_nonnull"], v["n_distinct"]) == (3, 2)
    assert v["min_value"] == "1.5000" and v["max_value"] == "2.5050"


def test_tpch_shapes_survive_no_broadcast(spark):
    """Broadcast-policy rehearsal over the deepest join trees: with
    auto-broadcast disabled entirely (every table 'too big'), the
    hint-free shapes must still plan (no forced broadcast anywhere)
    and return identical results via shuffle joins."""
    # allowed = the schema-bounded hints that SHOULD stay broadcast at
    # any scale: q5 hints nation+region, q9 hints nation only.
    names = {"q5_local_supplier_volume": 2, "q9_product_profit": 1}
    baseline = {
        n: sorted(map(tuple, QUERIES[n](spark, SF).collect())) for n in names
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for n, allowed in names.items():
            df = QUERIES[n](spark, SF)
            plan = _plan(df)
            assert plan.count("BroadcastHashJoin") <= allowed, (n, plan)
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, n
            assert sorted(map(tuple, df.collect())) == baseline[n], n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_portable_simhash_pairs_nonempty_and_sane(spark):
    """Portable SimHash: JVM-side plan; planted exact dups give
    hamming 0 rows; every emitted pair is within the pigeonhole
    threshold."""
    df = QUERIES["dedup_simhash_portable_pairs"](spark, SF)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows, "expected planted dup pairs at sf0.001"
    assert all(0 <= r["hamming"] <= 3 for r in rows)
    assert any(r["hamming"] == 0 for r in rows)  # exact dups collide fully


def test_merge_upsert_semantics(spark):
    """merge_upsert: inserts/updates/unchanged classified correctly,
    update values win, pass-through columns survive, null-safe change
    detection (NULL -> value is a change)."""
    from tfm_semisup_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0)],
        "id bigint, tag string, val double",
    )
    updates = spark.createDataFrame(
        [(2, 20.0), (3, 30.0), (4, 40.0)], "id bigint, val double"
    )
    rows = {
        r["id"]: r
        for r in merge_upsert(target, updates, ["id"], ["val"]).collect()
    }
    assert rows[1]["__merge_action"] == "unchanged" and rows[1]["val"] == 10.0
    assert rows[2]["__merge_action"] == "updated" and rows[2]["val"] == 20.0
    assert rows[2]["tag"] == "b"  # pass-through column survives update
    assert rows[3]["__merge_action"] == "unchanged"  # equal value
    assert rows[4]["__merge_action"] == "inserted" and rows[4]["tag"] is None

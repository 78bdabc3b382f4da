"""Physical-plan assertions for the round-3 queries: the plans the
100 TB design argument rests on, pinned so a refactor can't silently
regress them (same pattern as the no-Exchange checks in
test_quality_rules.py / test_governance.py)."""

from __future__ import annotations

from tfm_semisup_spark.queries import QUERIES, load_all_queries

SF = "/root/testdata/sf0.001"

load_all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_exists_compiles_to_semi_join(spark):
    plan = _plan(QUERIES["q4_priority_with_returns"](spark, SF))
    assert "LeftSemi" in plan
    # the probe side shuffles/broadcasts keys, never lineitem payloads
    assert "l_extendedprice" not in plan.split("LeftSemi")[0]


def test_q16_not_in_compiles_to_anti_join(spark):
    plan = _plan(QUERIES["q16_supplier_diversity"](spark, SF))
    assert "LeftAnti" in plan
    # tiny exclusion set broadcasts (formatted plan puts the join type
    # mid-line: "BroadcastHashJoin [keys], [keys], LeftAnti, ...")
    assert any(
        "Broadcast" in line and "LeftAnti" in line for line in plan.splitlines()
    )


def test_q22_anti_join_and_no_orders_payload(spark):
    plan = _plan(QUERIES["q22_global_sales_opportunity"](spark, SF))
    assert "LeftAnti" in plan
    # orders side is pruned to the join key only
    assert "o_totalprice" not in plan


def test_training_shards_single_hash_exchange(spark):
    """One hashpartitioning exchange on shard, per-shard sort — never a
    global single-partition sort."""
    plan = _plan(QUERIES["training_shard_assignment"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_resize_stub_scan_side_pruning(spark):
    """The resize query reads only what it needs: doc_id + text reach
    the scan; no full-width documents projection."""
    plan = _plan(QUERIES["multimodal_resize_stub"](spark, SF))
    assert "lang" not in plan and "n_chars" not in plan

"""Connected components (operators/components.py) invariants."""

from __future__ import annotations

import pytest

from tfm_semisup_spark.operators.components import (
    cluster_keepers,
    connected_components,
)


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        (r["node"], r["component"])
        for r in connected_components(df, **kw).collect()
    }


def _run_both(spark, edges, **kw):
    """Run the driver union-find fast path AND the distributed rounds
    (small_graph_max_edges=0 forces the latter); assert they agree and
    return the common result."""
    fast = _run(spark, edges, **kw)
    dist = _run(spark, edges, small_graph_max_edges=0, **kw)
    assert fast == dist
    return fast


def test_chain_collapses_to_min(spark):
    """A 12-node chain (worst diameter per edge count) — pointer
    jumping must collapse it well inside the iteration budget."""
    chain = [(i, i + 1) for i in range(11)]
    got = _run_both(spark, chain, max_iter=6)  # log2(12) ~ 3.6 rounds + slack
    assert got == {(i, 0) for i in range(12)}


def test_two_clusters_and_orientation_insensitivity(spark):
    edges = [(5, 3), (3, 9), (20, 21)]  # either orientation allowed
    got = _run_both(spark, edges)
    assert got == {(3, 3), (5, 3), (9, 3), (20, 20), (21, 20)}


def test_bridge_edge_merges_clusters(spark):
    base = [(1, 2), (10, 11)]
    assert _run_both(spark, base) == {(1, 1), (2, 1), (10, 10), (11, 10)}
    merged = _run_both(spark, base + [(2, 10)])
    assert merged == {(1, 1), (2, 1), (10, 1), (11, 1)}


def test_empty_and_self_loop(spark):
    assert _run_both(spark, []) == set()
    assert _run_both(spark, [(7, 7)]) == {(7, 7)}


def test_deterministic_across_partitionings(spark):
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(0, 38)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")

    def run(d):
        return sorted(
            (r["node"], r["component"]) for r in connected_components(d).collect()
        )

    assert run(df) == run(df.repartition(17))


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(30)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="converge"):
        # force the distributed rounds — the driver fast path has no
        # iteration budget to exhaust
        connected_components(df, max_iter=1, small_graph_max_edges=0)


def test_cluster_keepers_counts(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    comp = connected_components(df)
    got = {
        (r["component"], r["n_members"]) for r in cluster_keepers(comp).collect()
    }
    assert got == {(1, 3), (10, 2)}

"""Clamped label propagation (operators/label_propagation.py).

Covers: hand-computed fixed point on a tiny graph (vote + tie-break +
clamp + unreached semantics), driver-path == distributed-path
equality on the registered query's real graph, and determinism of the
registered ssl_label_propagation entry (oracle parity itself runs in
test_oracle_parity.py).
"""

from __future__ import annotations

from tfm_semisup_spark.operators.label_propagation import propagate_labels

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _tiny(spark):
    # 1 -- 2 -- 3 -- 4   and isolated 5; seeds: 1 (label 0), 4 (label 7)
    nodes = spark.createDataFrame(
        [(1, 1, 0), (2, 0, 9), (3, 0, 9), (4, 1, 7), (5, 0, 9)],
        "node long, is_seed int, y_true long",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    return nodes, edges


def test_tiny_graph_hand_computed(spark):
    nodes, edges = _tiny(spark)
    out = {r["node"]: r["y"] for r in propagate_labels(nodes, edges, iters=2).collect()}
    # iter1: 2 <- {0 from 1}, 3 <- {7 from 4}; iter2: 2 votes {0 from 1,
    # 7 from 3} -> tie -> smallest label 0; 3 votes {7 from 4, 0 from 2}
    # -> tie -> 0? No: at iter2 node 3's neighbors are 2 (labeled 0
    # after iter1) and 4 (clamped 7) -> tie {0:1, 7:1} -> min label 0.
    assert out[1] == 0 and out[4] == 7  # seeds clamped
    assert out[2] == 0  # tie (0 vs 7) breaks to smallest label
    assert out[3] == 0  # tie (0 from 2, 7 from 4) breaks to smallest
    assert out[5] is None  # isolated node never reached


def test_one_iteration_reach(spark):
    nodes, edges = _tiny(spark)
    out = {r["node"]: r["y"] for r in propagate_labels(nodes, edges, iters=1).collect()}
    assert out[2] == 0 and out[3] == 7  # one hop from each seed
    assert out[5] is None


def test_driver_equals_distributed(spark):
    nodes, edges = _tiny(spark)
    small = _rows(propagate_labels(nodes, edges, iters=3))
    dist = _rows(propagate_labels(nodes, edges, iters=3, small_graph_max_edges=0))
    assert small == dist


def test_driver_path_collects_only_incident_nodes(spark, monkeypatch):
    """VERDICT r7 #3: the ≤2M-edge driver path must NOT collect the
    node table — nodes can be corpus-sized while the similarity graph
    is sparse. Only edge-incident nodes (≤ 2*n_edges) may reach the
    driver; isolated nodes stream through distributed, y unchanged."""
    import tfm_semisup_spark.operators.label_propagation as lp

    n_nodes, seen = 5_000, {}
    nodes = spark.range(n_nodes).selectExpr(
        "id AS node",
        "CAST(id % 100 = 0 AS INT) AS is_seed",
        "id % 5 AS y_true",
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (100, 101)], "src long, dst long"
    )
    real = lp._driver_propagate

    def spy(label_rows, edge_rows, iters):
        seen["n_labels"] = len(label_rows)
        return real(label_rows, edge_rows, iters)

    monkeypatch.setattr(lp, "_driver_propagate", spy)
    out = propagate_labels(nodes, edges, iters=2)
    assert out.count() == n_nodes
    assert seen["n_labels"] == 5  # nodes {0,1,2,100,101}, not 5000
    # and the split is invisible to results: distributed path agrees
    dist = _rows(propagate_labels(nodes, edges, iters=2, small_graph_max_edges=0))
    monkeypatch.setattr(lp, "_driver_propagate", real)
    assert _rows(propagate_labels(nodes, edges, iters=2)) == dist


def test_registered_query_paths_agree_and_deterministic(spark, monkeypatch):
    """The real embeddings graph: distributed rounds == driver loop,
    and repeated runs are identical (integer votes, no randomness)."""
    import tfm_semisup_spark.operators.label_propagation as lp
    from tfm_semisup_spark.queries.ssl_queries import ssl_label_propagation

    r1 = _rows(ssl_label_propagation(spark, SF))
    r2 = _rows(ssl_label_propagation(spark, SF))
    assert r1 == r2 and len(r1) > 0
    monkeypatch.setattr(lp, "SMALL_GRAPH_MAX_EDGES", 0)
    r3 = _rows(ssl_label_propagation(spark, SF))
    assert r1 == r3
    # sanity: some non-seed nodes actually got a propagated label
    preds = [r for r in r1 if r[1] == 0 and r[3] != -1]
    assert len(preds) > 0

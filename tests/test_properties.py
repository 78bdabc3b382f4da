"""Property-based tests (hypothesis) for driver-side metric arithmetic
and columnar text helpers — SURVEY.md §5's upgrade over the reference's
test-free codebase."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tfm_semisup_spark.operators.evaluation import metrics_from_confusion
from tfm_semisup_spark.operators.results import SemiSupervisedSummary

cells_strategy = st.lists(
    st.tuples(
        st.sampled_from([0.0, 1.0, 2.0]),  # prediction
        st.sampled_from([0.0, 1.0, 2.0]),  # label
        st.integers(min_value=1, max_value=1000),
    ),
    min_size=0,
    max_size=9,
)


@given(cells_strategy)
@settings(max_examples=200, deadline=None)
def test_metrics_bounded(cells):
    m = metrics_from_confusion(cells)
    for v in (m.accuracy, m.auc_roc, m.auc_pr, m.f1_label1):
        assert 0.0 <= v <= 1.0 + 1e-12
    assert m.n_rows == sum(n for _, _, n in cells)


@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=0, max_value=10_000))
@settings(max_examples=100, deadline=None)
def test_perfect_predictions_perfect_accuracy(tp, tn):
    cells = [(1.0, 1.0, tp), (0.0, 0.0, tn)]
    cells = [(p, l, n) for p, l, n in cells if n > 0]
    m = metrics_from_confusion(cells)
    if m.n_rows:
        assert m.accuracy == 1.0
        if tp and tn:
            assert m.auc_roc == 1.0
            assert m.f1_label1 == 1.0


@given(
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=50, deadline=None)
def test_summary_percentage_bounds(lab, unlab):
    s = SemiSupervisedSummary(labeled_final=lab, unlabeled_final=unlab)
    assert 0.0 <= s.percentage_labeled_final <= 1.0


def test_word_ngram_counts_on_spark(spark):
    """n-gram count identity: max(0, len - n + 1) for arbitrary docs."""
    from pyspark.sql import functions as F

    from tfm_semisup_spark.functions.text import word_ngrams

    rows = [
        (i, " ".join(f"w{j % 7}" for j in range(k)))
        for i, k in enumerate([0, 1, 2, 3, 4, 10, 100])
    ]
    df = spark.createDataFrame(rows, ["id", "text"]).withColumn(
        "w", F.filter(F.split("text", " "), lambda t: t != "")
    )
    out = df.select(
        "id",
        F.size("w").alias("n_tok"),
        F.size(word_ngrams(F.col("w"), 3)).alias("n_tri"),
    ).collect()
    for r in out:
        assert r["n_tri"] == max(0, r["n_tok"] - 2)


def test_model_persistence_roundtrip(spark, tmp_path):
    """DefaultParamsWritable round-trip for our custom transformers."""
    from tfm_semisup_spark.operators.unlabeled import (
        DeterministicLabelMasker,
        UnlabeledTransformer,
    )

    m = DeterministicLabelMasker(percentageLabeled=0.25, idCol="vec_id", seed=99)
    p = str(tmp_path / "masker")
    m.save(p)
    m2 = DeterministicLabelMasker.load(p)
    assert m2.getOrDefault(m2.percentageLabeled) == 0.25
    assert m2.getOrDefault(m2.seed) == 99
    assert m2.getOrDefault(m2.idCol) == "vec_id"

    u = UnlabeledTransformer(percentageLabeled=0.4, seed=7)
    p2 = str(tmp_path / "unlabeled")
    u.save(p2)
    u2 = UnlabeledTransformer.load(p2)
    assert u2.getOrDefault(u2.percentageLabeled) == 0.4


# -- connected components vs a union-find reference ---------------------


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical min-label per node
    return {n: find(n) for n in parent}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=80,
    )
)
def test_connected_components_equals_union_find(spark, edges):
    """Distributed min-label propagation == sequential union-find on
    arbitrary graphs (multi-edges, either orientation, any topology).
    The min-reachable-id canonical label is the contract every dedup
    keeper decision rests on."""
    from tfm_semisup_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    ref = _union_find_components(edges)
    for forced in (None, 0):  # driver fast path AND distributed rounds
        kw = {} if forced is None else {"small_graph_max_edges": forced}
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, **kw).collect()
        }
        assert got == ref, f"path small_graph_max_edges={forced}"


def test_connected_components_chain_converges_logarithmically(spark):
    """Adversarial path graph (diameter 40): pointer jumping must
    converge in O(log diameter) rounds, far under the 25-round bound a
    plain propagation would blow through."""
    import tfm_semisup_spark.operators.components as C

    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"]
        for r in C.connected_components(df, small_graph_max_edges=0).collect()
    }
    assert got == {n: 0 for n in range(41)}
    assert C.last_convergence_rounds <= 8

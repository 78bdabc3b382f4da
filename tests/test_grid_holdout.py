"""Hold-out baseline runner (reference C12) + multi-classifier grid."""

from __future__ import annotations

import pytest
from pyspark.ml.classification import (
    DecisionTreeClassifier,
    LogisticRegression,
    RandomForestClassifier,
)
from pyspark.sql import functions as F

from tfm_semisup_spark.featurization import ArrayToVector
from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.grid import (
    HOLDOUT_SCHEMA,
    build_ssl_grid,
    run_experiment_grid,
    run_holdout_baselines,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def points(spark):
    emb = load_table(spark, SF, "embeddings")
    df = ArrayToVector(inputCol="embedding", outputCol="features").transform(emb)
    return df.select(
        "vec_id", "features",
        F.when(F.col("label") == 1, 1.0).otherwise(0.0).alias("label"),
    ).cache()


def test_holdout_baselines_shape_and_metrics(spark, points):
    results = run_holdout_baselines(
        spark,
        points,
        "embeddings",
        [],
        classifiers={
            "DT": lambda: DecisionTreeClassifier(seed=5),
            "LR": lambda: LogisticRegression(maxIter=20),
        },
        percentages=[0.3, 0.6],
    )
    rows = results.collect()
    assert len(rows) == 4  # 2 pcts x 2 classifiers
    assert results.schema == HOLDOUT_SCHEMA
    for r in rows:
        assert 0.0 <= r["accuracy"] <= 1.0
        assert 0.0 <= r["AUC"] <= 1.0
    # more training data should not wildly hurt DT accuracy (sanity, not strict)
    by_key = {(r["clasificador"], r["porcentajeEtiquetado"]): r["accuracy"] for r in rows}
    assert set(by_key) == {("DT", 0.3), ("DT", 0.6), ("LR", 0.3), ("LR", 0.6)}


def test_multi_classifier_ssl_grid(spark, points):
    cells = build_ssl_grid(
        classifiers={
            "DT": lambda: DecisionTreeClassifier(seed=5),
            "RF": lambda: RandomForestClassifier(seed=5, numTrees=5),
            "LR": lambda: LogisticRegression(maxIter=10),
        },
        percentages=[0.3],
        thresholds=[0.8],
        family="selfTraining",
        max_iter=2,
    )
    results = run_experiment_grid(
        spark, points, "embeddings", [], cells, k=2, id_col="vec_id"
    )
    rows = {r["classifier"]: r for r in results.collect()}
    assert set(rows) == {"DT", "RF", "LR"}
    for r in rows.values():
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["LabeledInitial"] > 0


def test_two_criteria_grid(spark, points):
    """E2 lifecycle with BOTH promotion criteria in one grid."""
    cells = build_ssl_grid(
        classifiers={"DT": lambda: DecisionTreeClassifier(seed=5)},
        percentages=[0.3],
        thresholds=[0.8],
        kbests=[0.5],
        criteria=("threshold", "kBest"),
        family="selfTraining",
        max_iter=2,
    )
    assert len(cells) == 2
    results = run_experiment_grid(
        spark, points, "embeddings", [], cells, k=2, id_col="vec_id"
    )
    rows = {r["criterion"]: r for r in results.collect()}
    assert set(rows) == {"threshold", "kBest"}
    assert rows["threshold"]["thresholdOrKBest"] == 0.8
    assert rows["kBest"]["thresholdOrKBest"] == 0.5


def test_all_results_csv_matches_reference_shape(spark, points, tmp_path):
    """Golden-shape parity with the reference's AllResults.csv
    (notebooks/SemiSupervised/Results/AllResults.csv:1): identical
    header (column names AND order), one data row per grid cell,
    values parse back under RESULTS_SCHEMA. Row-level value diffing
    is out of scope by design: seeded split membership differs by
    engine (SURVEY §5), so value parity is bounded against
    BASELINE.md anchors in test_baseline_parity.py instead."""
    import csv
    import glob
    import os

    from tfm_semisup_spark.operators.grid import write_all_results_csv

    cells = build_ssl_grid(
        classifiers={"DT": lambda: DecisionTreeClassifier(seed=5)},
        percentages=[0.3],
        thresholds=[0.75],
        family="selfTraining",
        max_iter=2,
    )
    results = run_experiment_grid(
        spark, points, "embeddings", [], cells, k=2, id_col="vec_id"
    )
    out = str(tmp_path / "all_results")
    write_all_results_csv(results, out)
    part = glob.glob(os.path.join(out, "part-*.csv"))
    assert len(part) == 1
    with open(part[0]) as f:
        rows = list(csv.reader(f))
    ref_header = (
        "data,classifier,criterion,percentageLabeled,thresholdOrKBest,"
        "iteration,LabeledInitial,UnLabeledInitial,LabeledFinal,"
        "UnLabeledFinal,percentageLabeledFinal,accuracy,AUC,PR,F1score"
    ).split(",")
    ref_csv = "/root/reference/notebooks/SemiSupervised/Results/AllResults.csv"
    if os.path.exists(ref_csv):
        with open(ref_csv) as f:
            ref_header = next(csv.reader(f))
    assert rows[0] == ref_header
    assert len(rows) == 1 + len(cells)
    # values round-trip: numeric fields parse, label counts consistent
    rec = dict(zip(rows[0], rows[1]))
    assert rec["data"] == "embeddings" and rec["criterion"] == "threshold"
    assert int(rec["LabeledInitial"]) + int(rec["UnLabeledInitial"]) > 0
    assert 0.0 <= float(rec["accuracy"]) <= 1.0

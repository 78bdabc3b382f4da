"""Reference-quality parity bounds (VERDICT r1 #4).

The reference publishes quality anchors, not wall-clock (BASELINE.md):
4-fold-CV grids over pct x threshold x {DT, RF, NB, LR} per dataset
(`SemiSupervisedAndBaseClassifiers.scala:140-143`) plus supervised
hold-out baselines. Its datasets (KEEL/Adult) are not in this
container, so these tests run the SAME grid shape on the synthetic
embeddings analog and assert the structural claims the published
numbers exhibit:

- ST tracks supervised within a few points on the same classifier —
  every BASELINE.md dataset anchor pair differs by <= 0.025 (e.g.
  wisconsin ST-RF 0.9736 `AllResults.csv:882` vs supervised RF 0.9692
  `AllResults.csv:397`; heart 0.8377 vs 0.8373; coil2000 0.9403 vs
  0.9404). Band here: 0.05.
- The published "AUC" is the hard-prediction trapezoid
  (1 + TPR - FPR) / 2 (`FunctionsSemiSupervised.scala:294-300`) —
  asserted against an independent confusion computed in pandas.
- The Adult config runs end-to-end: maxBins=42 tree classifiers
  (`SemiSupervisedAndBaseClassifiers.scala:399,463`,
  `BaseClassifiers.scala:568-570`) and default-multinomial NaiveBayes
  (`:142`) — NB needs non-negative features, supplied by a fit-free
  positive/negative-part split of each embedding dimension.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfm_semisup_spark.featurization import ArrayToVector
from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.grid import (
    ADULT_MAX_BINS,
    build_ssl_grid,
    reference_classifiers,
    run_experiment_grid,
    run_holdout_baselines,
)

SF = "/root/testdata/sf0.001"
CLASSIFIERS = ("DT", "RF", "NB", "LR")


@pytest.fixture(scope="module")
def labeled_points(spark):
    emb = load_table(spark, SF, "embeddings")
    df = ArrayToVector(inputCol="embedding", outputCol="features").transform(emb)
    return df.select(
        "vec_id",
        "features",
        F.when(F.col("label") == 1, 1.0).otherwise(0.0).alias("label"),
    ).cache()


@pytest.fixture(scope="module")
def grid_rows(spark, labeled_points):
    """The reference's full grid shape, one pct/threshold cell per
    classifier, both families, 2-fold CV."""
    clfs = reference_classifiers(nb_model_type="gaussian")
    cells = build_ssl_grid(
        clfs, percentages=[0.3], thresholds=[0.7], family="selfTraining", max_iter=3
    ) + build_ssl_grid(
        clfs, percentages=[0.3], criteria=("supervised",), family="supervised"
    )
    res = run_experiment_grid(
        spark, labeled_points, "embeddings", [], cells, k=2, id_col="vec_id"
    )
    return res.collect()


def test_grid_runs_all_four_classifiers_both_families(grid_rows):
    by_family = {}
    for r in grid_rows:
        by_family.setdefault(r["criterion"], set()).add(r["classifier"])
    assert by_family["threshold"] == set(CLASSIFIERS)
    assert by_family["supervised"] == set(CLASSIFIERS)


def test_grid_metrics_plausible(grid_rows):
    """Metric levels a working classifier must reach on this analog:
    accuracy comfortably above coin-flip on a ~90/10 task, every metric
    in [0,1], pool bookkeeping conserved."""
    for r in grid_rows:
        for col in ("accuracy", "AUC", "PR", "F1score"):
            assert 0.0 <= r[col] <= 1.0, (r["classifier"], col, r[col])
        assert r["accuracy"] >= 0.7, (r["classifier"], r["criterion"], r["accuracy"])
        assert (
            r["LabeledFinal"] + r["UnLabeledFinal"]
            == r["LabeledInitial"] + r["UnLabeledInitial"]
        )
        assert r["LabeledFinal"] >= r["LabeledInitial"]
        assert r["iteration"] <= 3


def test_self_training_tracks_supervised_per_classifier(grid_rows):
    """BASELINE.md anchor structure: |acc(ST) - acc(supervised)| small
    on the same classifier/pct (published pairs all within 0.025)."""
    st = {r["classifier"]: r["accuracy"] for r in grid_rows if r["criterion"] == "threshold"}
    sup = {r["classifier"]: r["accuracy"] for r in grid_rows if r["criterion"] == "supervised"}
    for clf in CLASSIFIERS:
        assert abs(st[clf] - sup[clf]) <= 0.05, (clf, st[clf], sup[clf])


def test_auc_quirk_identity_on_fitted_model(spark, labeled_points):
    """The reference's 'AUC' == (1 + TPR - FPR) / 2 exactly
    (`FunctionsSemiSupervised.scala:294-300` feeds hard predictions to
    BinaryClassificationMetrics) — recomputed independently in pandas
    from a real fitted model's predictions."""
    from pyspark.ml.classification import DecisionTreeClassifier

    from tfm_semisup_spark.operators.evaluation import evaluate_predictions

    model = DecisionTreeClassifier(seed=5).fit(labeled_points)
    preds = model.transform(labeled_points)
    m = evaluate_predictions(preds)

    pdf = preds.select("prediction", "label").toPandas()
    tp = len(pdf[(pdf.prediction == 1.0) & (pdf.label == 1.0)])
    fp = len(pdf[(pdf.prediction == 1.0) & (pdf.label != 1.0)])
    fn = len(pdf[(pdf.prediction != 1.0) & (pdf.label == 1.0)])
    tn = len(pdf) - tp - fp - fn
    tpr = tp / (tp + fn)
    fpr = fp / (fp + tn)
    assert m.auc_roc == pytest.approx((1.0 + tpr - fpr) / 2.0)
    assert m.accuracy == pytest.approx((tp + tn) / len(pdf))


@pytest.fixture(scope="module")
def nonneg_points(spark):
    """Fit-free non-negative encoding for multinomial NB: each dim x ->
    (max(x,0), max(-x,0)). No fitted scaler => no train/test range
    leakage and no out-of-range negatives at transform time."""
    emb = load_table(spark, SF, "embeddings")
    nonneg = F.concat(
        F.transform("embedding", lambda x: F.greatest(x, F.lit(0.0))),
        F.transform("embedding", lambda x: F.greatest(-x, F.lit(0.0))),
    )
    df = ArrayToVector(inputCol="embedding", outputCol="features").transform(
        emb.withColumn("embedding", nonneg)
    )
    return df.select(
        "vec_id",
        "features",
        F.when(F.col("label") == 1, 1.0).otherwise(0.0).alias("label"),
    ).cache()


def test_holdout_adult_config_multinomial_nb_maxbins42(spark, nonneg_points):
    """The published Adult config end-to-end: holdout runner (C12) with
    maxBins=42 DT/RF and default (multinomial) NaiveBayes, all four
    classifiers producing plausible rows (resultsClasificadoresBase.csv
    schema; ADULT NB anchor 0.7712 `resultsClasificadoresBase.csv:41`)."""
    hold = run_holdout_baselines(
        spark,
        nonneg_points,
        "embeddings",
        [],
        reference_classifiers(max_bins=ADULT_MAX_BINS),
        percentages=[0.3],
    )
    rows = {r["clasificador"]: r for r in hold.collect()}
    assert set(rows) == set(CLASSIFIERS)
    for clf, r in rows.items():
        assert 0.7 <= r["accuracy"] <= 1.0, (clf, r["accuracy"])
        for col in ("AUC", "PR", "F1score"):
            assert 0.0 <= r[col] <= 1.0


def test_holdout_lsvm_baseline_anchor(spark, nonneg_points):
    """LSVM holdout parity anchor (VERDICT r10 #6): the reference's
    supervised baseline grid includes LinearSVC
    (`BaseClassifiers.scala:334,573`); its published BCW anchor 0.9653
    (`resultsClasificadoresBase.csv:20`) sits 0.0208 under LR's 0.9861
    on the same split. Structural claims on the synthetic analog, same
    tolerance scheme as the other anchors: LSVM trains through the
    holdout runner, reaches working-classifier accuracy, and tracks LR
    within the 0.05 band."""
    from tfm_semisup_spark.operators.grid import baseline_classifiers

    hold = run_holdout_baselines(
        spark,
        nonneg_points,
        "embeddings",
        [],
        baseline_classifiers(max_bins=ADULT_MAX_BINS),
        percentages=[0.3],
    )
    rows = {r["clasificador"]: r for r in hold.collect()}
    assert set(rows) == set(CLASSIFIERS) | {"LSVM"}
    lsvm = rows["LSVM"]
    assert 0.7 <= lsvm["accuracy"] <= 1.0, lsvm["accuracy"]
    for col in ("AUC", "PR", "F1score"):
        assert 0.0 <= lsvm[col] <= 1.0
    assert abs(lsvm["accuracy"] - rows["LR"]["accuracy"]) <= 0.05, (
        lsvm["accuracy"],
        rows["LR"]["accuracy"],
    )


def test_lsvm_still_excluded_from_ssc(spark):
    """The baseline factory adds LSVM for holdouts ONLY — the SSC
    exclusion rule (`SelfTraining.scala:17-24`) must still reject it."""
    from pyspark.ml.classification import LinearSVC

    from tfm_semisup_spark.operators.self_training import require_probabilistic

    with pytest.raises(TypeError):
        require_probabilistic(LinearSVC())

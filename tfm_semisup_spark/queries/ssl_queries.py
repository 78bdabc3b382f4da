"""Semi-supervised-learning query entries (rows-only checked).

Iterative ML training is genuinely non-SQL-expressible, so these have
no oracle_sql entries (driver contract: rows-only check). Each returns
one AllResults-schema row (FIXTURES.md A6) and is deterministic:
hash-based label masking (partitioning-independent), fixed classifier
seeds, hash-based CV folds.

Task mapping: embeddings(array<float> -> features via array_to_vector),
binary label "class 1 vs rest" (the reference's datasets are binary;
fMeasure(1) / hard-AUC metrics are label-1-positive — BASELINE.md).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import DecisionTreeClassifier, RandomForestClassifier
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.featurization import ArrayToVector
from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.co_training import CoTraining
from tfm_semisup_spark.operators.evaluation import evaluate_predictions
from tfm_semisup_spark.operators.grid import (
    RESULTS_SCHEMA,
    build_ssl_grid,
    run_experiment_grid,
)
from tfm_semisup_spark.operators.self_training import SelfTraining
from tfm_semisup_spark.operators.supervised import Supervised
from tfm_semisup_spark.operators.unlabeled import DeterministicLabelMasker
from tfm_semisup_spark.queries import register


def _labeled_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    df = ArrayToVector(inputCol="embedding", outputCol="features").transform(emb)
    return df.select(
        "vec_id",
        "features",
        F.when(F.col("label") == 1, 1.0).otherwise(0.0).alias("label"),
    )


def _masked(spark: SparkSession, sf_dir: str, pct: float = 0.3) -> DataFrame:
    return DeterministicLabelMasker(
        percentageLabeled=pct, idCol="vec_id", seed=11
    ).transform(_labeled_points(spark, sf_dir))


def _result_row(
    spark: SparkSession,
    data_name: str,
    clf: str,
    criterion: str,
    pct: float,
    value: float,
    model,
    eval_df: DataFrame,
) -> DataFrame:
    m = evaluate_predictions(model.transform(eval_df))
    s = model.ss_summary
    row = (
        data_name, clf, criterion, float(pct), float(value),
        int(s.iterations), int(s.labeled_initial), int(s.unlabeled_initial),
        int(s.labeled_final), int(s.unlabeled_final),
        float(round(s.percentage_labeled_final, 6)),
        float(round(m.accuracy, 6)), float(round(m.auc_roc, 6)),
        float(round(m.auc_pr, 6)), float(round(m.f1_label1, 6)),
    )
    return spark.createDataFrame([row], RESULTS_SCHEMA)


@register("ssl_selftrain_threshold")
def ssl_selftrain_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    data = _masked(spark, sf_dir, 0.3)
    st = SelfTraining(
        baseClassifier=DecisionTreeClassifier(seed=5), threshold=0.75, maxIter=4
    )
    model = st.fit(data)
    return _result_row(
        spark, "embeddings", "DT", "threshold", 0.3, 0.75, model,
        _labeled_points(spark, sf_dir),
    )


@register("ssl_selftrain_kbest")
def ssl_selftrain_kbest(spark: SparkSession, sf_dir: str) -> DataFrame:
    data = _masked(spark, sf_dir, 0.3)
    st = SelfTraining(
        baseClassifier=DecisionTreeClassifier(seed=5),
        criterion="kBest",
        kBest=0.5,
        maxIter=3,
    )
    model = st.fit(data)
    return _result_row(
        spark, "embeddings", "DT", "kBest", 0.3, 0.5, model,
        _labeled_points(spark, sf_dir),
    )


@register("ssl_selftrain_nb")
def ssl_selftrain_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaiveBayes-backed SelfTraining — completes the reference's
    4-classifier set DT/RF/NB/LR (`SemiSupervisedAndBaseClassifiers
    .scala:140-143`). Gaussian event model because embeddings are
    signed (the reference's multinomial default assumes non-negative
    features; exercised on a scaled path in tests/test_baseline_parity
    .py). NB has no seed param — fully deterministic."""
    from pyspark.ml.classification import NaiveBayes

    data = _masked(spark, sf_dir, 0.3)
    st = SelfTraining(
        baseClassifier=NaiveBayes(modelType="gaussian"), threshold=0.75, maxIter=3
    )
    model = st.fit(data)
    return _result_row(
        spark, "embeddings", "NB", "threshold", 0.3, 0.75, model,
        _labeled_points(spark, sf_dir),
    )


@register("ssl_cotrain_threshold")
def ssl_cotrain_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    data = _masked(spark, sf_dir, 0.3)
    ct = CoTraining(
        baseClassifier=DecisionTreeClassifier(seed=5), threshold=0.75, maxIter=3
    )
    model = ct.fit(data)
    return _result_row(
        spark, "embeddings", "DT", "threshold", 0.3, 0.75, model,
        _labeled_points(spark, sf_dir),
    )


@register("ssl_cotrain_feature_split")
def ssl_cotrain_feature_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic Blum-Mitchell co-training (viewSplit='features'):
    disjoint half-vector views over one shared pool — the published
    algorithm alongside the reference's instance-split deviation
    (VERDICT r5 #7). Deterministic: hash-based masking, seeded trees,
    and per-view promotion that depends only on row content."""
    data = _masked(spark, sf_dir, 0.3)
    ct = CoTraining(
        baseClassifier=DecisionTreeClassifier(seed=5),
        threshold=0.75,
        maxIter=3,
        viewSplit="features",
    )
    model = ct.fit(data)
    return _result_row(
        spark, "embeddings", "DT", "featureSplit", 0.3, 0.75, model,
        _labeled_points(spark, sf_dir),
    )


@register("ssl_supervised_baseline")
def ssl_supervised_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    data = _masked(spark, sf_dir, 0.3)
    model = Supervised(baseClassifier=RandomForestClassifier(seed=5, numTrees=10)).fit(data)
    return _result_row(
        spark, "embeddings", "RF", "supervised", 0.3, 0.0, model,
        _labeled_points(spark, sf_dir),
    )


@register("ssl_cv_grid")
def ssl_cv_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-cell experiment grid with 2-fold CV — the reference's full
    E2 lifecycle (grid -> pipeline assembly -> CV -> results table)."""
    data = _labeled_points(spark, sf_dir)
    cells = build_ssl_grid(
        classifiers={"DT": lambda: DecisionTreeClassifier(seed=5)},
        percentages=[0.3],
        thresholds=[0.8],
        family="selfTraining",
        max_iter=2,
    )
    return run_experiment_grid(
        spark, data, "embeddings", [], cells, k=2, id_col="vec_id"
    )


@register("ssl_pipeline_end_to_end")
def ssl_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Pipeline composition (featurization stage + masker + SSC
    estimator) as one pyspark.ml.Pipeline — class-distribution of
    predictions over the corpus (reference E1 lifecycle)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "label", F.when(F.col("label") == 1, 1.0).otherwise(0.0)
    )
    pipeline = Pipeline(
        stages=[
            ArrayToVector(inputCol="embedding", outputCol="features"),
            DeterministicLabelMasker(percentageLabeled=0.3, idCol="vec_id", seed=11),
            SelfTraining(
                baseClassifier=DecisionTreeClassifier(seed=5), threshold=0.8, maxIter=3
            ),
        ]
    )
    model = pipeline.fit(emb)
    preds = model.transform(emb)
    return (
        preds.groupBy(F.col("prediction").cast("long").alias("prediction"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register("ssl_holdout_baselines")
def ssl_holdout_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised hold-out baseline table (reference C12/E3 lifecycle;
    resultsClasificadoresBase.csv schema)."""
    from tfm_semisup_spark.operators.grid import run_holdout_baselines

    data = _labeled_points(spark, sf_dir)
    return run_holdout_baselines(
        spark,
        data,
        "embeddings",
        [],
        classifiers={"DT": lambda: DecisionTreeClassifier(seed=5)},
        percentages=[0.3, 0.6],
    )


@register("ssl_featurization_path")
def ssl_featurization_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical featurization path (reference C6
    indexStringColumnsStagePipeline + VectorAssembler,
    `FunctionsSemiSupervised.scala:32-42`): multi-col StringIndexer
    (handleInvalid=keep) + assembler over customer, then a supervised
    fit predicting a binarized balance class. Rows-only (StringIndexer
    ordering + DT are ML-side)."""
    from pyspark.ml import Pipeline

    from tfm_semisup_spark.featurization import build_featurization

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "balance_class", F.when(F.col("c_acctbal") > 5000, "high").otherwise("low")
    )
    stages = build_featurization(
        categorical_cols=["c_mktsegment"],
        numeric_cols=["c_acctbal", "c_nationkey"],
        label_col="balance_class",
    )
    pipeline = Pipeline(
        stages=stages
        + [
            DeterministicLabelMasker(
                percentageLabeled=0.5, idCol="c_custkey", seed=11
            ),
            Supervised(baseClassifier=DecisionTreeClassifier(seed=5)),
        ]
    )
    model = pipeline.fit(cust)
    preds = model.transform(cust)
    return (
        preds.groupBy(
            F.col("label").cast("long").alias("label"),
            F.col("prediction").cast("long").alias("prediction"),
        ).agg(F.count(F.lit(1)).alias("n"))
    )

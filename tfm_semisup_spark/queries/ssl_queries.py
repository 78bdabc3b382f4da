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


# ---------------------------------------------------------------------------
# Graph-based SSL: clamped label propagation (operators/label_propagation.py)
# — the first ORACLE-CHECKED member of the SSL family. All vote
# arithmetic is integer with a deterministic tie-break, so the DuckDB
# unrolled-iteration CTE chain reproduces the fixed-point table
# exactly; the only float math (the cosine edge predicate) is the same
# expression on both sides over double-cast inputs, far from the
# threshold relative to ULP noise.
#
# ORACLE TIER — the graph is the exact-cosine pairs among a keyed
# subset (vec_id % 4, mirroring similarity_pairs_above's bound); the
# 100 TB edge path is the LSH-bucketed similarity tier (see the
# operator docstring). Seeds are a deterministic key slice
# (vec_id % 12 == 0 given the % 4 subset -> every 3rd node), matching
# the hash-mask seeding discipline of DeterministicLabelMasker.
# ---------------------------------------------------------------------------


def _lp_oracle(iters: int = 3, tau: float = 0.2) -> str:
    parts = [
        f"""
WITH sub AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 4 = 0
),
p AS (
  SELECT a.vec_id AS sa, b.vec_id AS sb
  FROM sub a JOIN sub b ON a.vec_id < b.vec_id
  WHERE list_inner_product(a.v, b.v)
          / (sqrt(list_inner_product(a.v, a.v))
             * sqrt(list_inner_product(b.v, b.v))) >= {tau}
),
e AS (SELECT sa AS src, sb AS dst FROM p
      UNION ALL SELECT sb AS src, sa AS dst FROM p),
l0 AS (
  SELECT vec_id,
         CASE WHEN vec_id % 12 = 0 THEN 1 ELSE 0 END AS is_seed,
         label AS y_true,
         CASE WHEN vec_id % 12 = 0 THEN label END AS y
  FROM sub
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
v{t} AS (
  SELECT e.dst AS vec_id, l.y, COUNT(*) AS c
  FROM e JOIN l{t - 1} l ON e.src = l.vec_id
  WHERE l.y IS NOT NULL GROUP BY e.dst, l.y
),
b{t} AS (
  SELECT vec_id, y FROM (
    SELECT vec_id, y,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY c DESC, y ASC) AS rn
    FROM v{t}) WHERE rn = 1
),
l{t} AS (
  SELECT l.vec_id, l.is_seed, l.y_true,
         CASE WHEN l.is_seed = 1 THEN l.y_true
              ELSE COALESCE(b.y, l.y) END AS y
  FROM l{t - 1} l LEFT JOIN b{t} b ON l.vec_id = b.vec_id
)"""
        )
    parts.append(
        f"""
SELECT vec_id, CAST(is_seed AS BIGINT) AS is_seed,
       CAST(y_true AS BIGINT) AS y_true,
       CAST(COALESCE(y, -1) AS BIGINT) AS y_pred
FROM l{iters}"""
    )
    return "".join(parts)


@register("ssl_label_propagation", _lp_oracle())
def ssl_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped majority-vote label propagation, 3 synchronous rounds
    over the exact-cosine graph (tau=0.2) on the vec_id % 4 subset;
    seeds = vec_id % 12 == 0. Output: (vec_id, is_seed, y_true,
    y_pred) with unreached nodes at -1."""
    from tfm_semisup_spark.functions.vector import cosine_paired, l2_norm_fixed
    from tfm_semisup_spark.io import embedding_dim
    from tfm_semisup_spark.operators.label_propagation import propagate_labels

    emb = load_table(spark, sf_dir, "embeddings")
    dim = embedding_dim(sf_dir)
    sub = emb.where(F.col("vec_id") % 4 == 0).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # Norms projected per side BEFORE the pair join (graph build): the
    # cosine composite fused with join+filter overflows the JVM 64 KB
    # codegen limit and runs interpreted (vector.cosine_paired).
    a = sub.select(
        F.col("vec_id").alias("sa"),
        F.col("v").alias("va"),
        l2_norm_fixed("v", dim).alias("na"),
    )
    b = sub.select(
        F.col("vec_id").alias("sb"),
        F.col("v").alias("vb"),
        l2_norm_fixed("v", dim).alias("nb"),
    )
    edges = (
        a.join(b, F.col("sa") < F.col("sb"))
        .where(cosine_paired("va", "vb", "na", "nb", dim) >= 0.2)
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
    )
    nodes = sub.select(
        F.col("vec_id").alias("node"),
        F.when(F.col("vec_id") % 12 == 0, 1).otherwise(0).alias("is_seed"),
        F.col("label").alias("y_true"),
    )
    out = propagate_labels(nodes, edges, iters=3)
    return out.select(
        F.col("node").alias("vec_id"),
        F.col("is_seed").cast("long").alias("is_seed"),
        F.col("y_true").cast("long").alias("y_true"),
        F.coalesce(F.col("y"), F.lit(-1)).cast("long").alias("y_pred"),
    )


@register("ssl_tritrain")
def ssl_tritrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tri-Training (Zhou & Li 2005, operators/tri_training.py) on the
    masked embeddings task — the third disagreement-based SSC family
    member. Deterministic: hash-subsample diversification + fixed
    seeds; rows-only checked like the other iterative-ML entries."""
    from tfm_semisup_spark.operators.tri_training import TriTraining

    data = _masked(spark, sf_dir, 0.3)
    tt = TriTraining(baseClassifier=DecisionTreeClassifier(seed=5), maxIter=4)
    model = tt.fit(data)
    return _result_row(
        spark, "embeddings", "DT", "tri", 0.3, 0.0, model,
        _labeled_points(spark, sf_dir),
    )


@register("ssl_paired_fold_ttest")
def ssl_paired_fold_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired per-fold t-test: does SelfTraining beat its supervised
    baseline? The model-comparison readout the reference's thesis
    tables imply (AllResults rows compare SSC vs supervised per config;
    this adds the significance statistic — Dietterich's paired
    cross-validated t-test over k fold-accuracy differences).

    Rows-only by necessity (MLlib tree fits), deterministic end to
    end: hash folds (``assign_folds``), hash label masking, seeded
    DTs. One row: (k_folds, mean_acc_ssl, mean_acc_sup, mean_diff,
    t_stat); t = d̄ / (s_d/√k), 0.0 when every fold ties (s_d = 0 —
    ANSI-safe, no 0/0)."""
    import math

    from tfm_semisup_spark.operators.evaluation import assign_folds

    k = 3
    pts = _labeled_points(spark, sf_dir)
    folded = assign_folds(pts, k, id_col="vec_id").localCheckpoint(eager=True)
    masker = DeterministicLabelMasker(
        percentageLabeled=0.3, idCol="vec_id", seed=11
    )
    diffs, accs_ssl, accs_sup = [], [], []
    for fold in range(k):
        train = masker.transform(folded.where(F.col("fold") != fold))
        test = folded.where(F.col("fold") == fold)
        ssl = SelfTraining(
            baseClassifier=DecisionTreeClassifier(seed=5),
            threshold=0.75,
            maxIter=2,
        ).fit(train)
        sup = Supervised(baseClassifier=DecisionTreeClassifier(seed=5)).fit(
            train
        )
        a_ssl = evaluate_predictions(ssl.transform(test)).accuracy
        a_sup = evaluate_predictions(sup.transform(test)).accuracy
        accs_ssl.append(a_ssl)
        accs_sup.append(a_sup)
        diffs.append(a_ssl - a_sup)
    mean_d = sum(diffs) / k
    var_d = sum((d - mean_d) ** 2 for d in diffs) / (k - 1)
    t = 0.0 if var_d == 0.0 else mean_d / math.sqrt(var_d / k)
    row = (
        k,
        float(round(sum(accs_ssl) / k, 6)),
        float(round(sum(accs_sup) / k, 6)),
        float(round(mean_d, 6)),
        float(round(t, 6)),
    )
    return spark.createDataFrame(
        [row],
        "k_folds int, mean_acc_ssl double, mean_acc_sup double, "
        "mean_diff double, t_stat double",
    )

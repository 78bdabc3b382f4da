"""End-to-end integration mirroring the reference's NYC-taxi notebook
flow (FIXTURES.md A4; ``SemiSupervisedAndBaseClassifiers.scala:804-949``):
derive time parts + haversine distance, filter outliers, binarize the
class, featurize, mask labels, self-train, evaluate. Events stands in
for trips (synthetic coords from columns)."""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import DecisionTreeClassifier
from pyspark.sql import functions as F

from tfm_semisup_spark.featurization import build_featurization
from tfm_semisup_spark.functions.geo import haversine_km
from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.evaluation import evaluate_predictions
from tfm_semisup_spark.operators.self_training import SelfTraining
from tfm_semisup_spark.operators.unlabeled import DeterministicLabelMasker

SF = "/root/testdata/sf0.001"


def test_taxi_style_pipeline_end_to_end(spark):
    events = load_table(spark, SF, "events")

    # feature derivation (A4: month/day/fractional-hour + haversine)
    lat1 = F.abs(F.col("value")) % 90
    lon1 = F.col("user_id") % 180
    lat2 = (F.col("user_id") * 7) % 90
    lon2 = (F.col("event_id") * 11) % 180
    trips = events.select(
        "event_id",
        "event_type",
        F.month("ts").cast("double").alias("pickup_month"),
        F.dayofmonth("ts").cast("double").alias("pickup_day"),
        (F.hour("ts") + F.minute("ts") / 60.0 + F.second("ts") / 3600.0).alias(
            "pickup_time"
        ),
        haversine_km(lat1, lon1, lat2, lon2).alias("diff_distance"),
        F.col("value").alias("trip_value"),
    )

    # outlier filters (A4: distance/duration/passenger bounds)
    clean = trips.where(
        (F.col("diff_distance") >= 0.3)
        & (F.col("diff_distance") <= 20000)
        & (F.col("trip_value") <= 400)
    )

    # class binarization (A4: Long/Short by duration threshold)
    labeled = clean.withColumn(
        "clase", F.when(F.col("trip_value") > 35, "Long").otherwise("Short")
    )

    # featurization: categorical event_type + numeric derived features
    stages = build_featurization(
        categorical_cols=["event_type"],
        numeric_cols=["pickup_month", "pickup_day", "pickup_time", "diff_distance"],
        label_col="clase",
    )
    pipeline = Pipeline(
        stages=stages
        + [
            DeterministicLabelMasker(
                percentageLabeled=0.3, idCol="event_id", seed=11
            ),
            SelfTraining(
                baseClassifier=DecisionTreeClassifier(seed=5),
                threshold=0.8,
                maxIter=3,
            ),
        ]
    )
    model = pipeline.fit(labeled)
    preds = model.transform(labeled)
    m = evaluate_predictions(preds)

    assert m.n_rows == labeled.count()
    assert 0.0 <= m.accuracy <= 1.0
    # label has no real signal in features (value threshold vs time/geo
    # features), but the majority class alone guarantees ~>40%
    assert m.accuracy > 0.4
    # SSC bookkeeping flows through the whole pipeline
    st_model = model.stages[-1]
    assert st_model.ss_summary.labeled_initial > 0
    assert st_model.ss_summary.labeled_final >= st_model.ss_summary.labeled_initial


def test_poker_style_pipeline_end_to_end(spark):
    """A3 fixture path (`SemiSupervisedAndBaseClassifiers.scala:529-604`):
    integer codes treated as categoricals via StringIndexer, class
    binarized with when/otherwise, supervised fit."""
    from tfm_semisup_spark.operators.supervised import Supervised

    li = load_table(spark, SF, "lineitem").limit(2000)
    hands = li.select(
        F.monotonically_increasing_id().alias("row_id"),
        F.col("l_linenumber").cast("string").alias("c0"),
        F.col("l_returnflag").alias("c1"),
        F.col("l_linestatus").alias("c2"),
        F.when(F.col("l_quantity") > 25, "AtleastOnePair").otherwise("Nothing").alias(
            "clase"
        ),
        "l_quantity",
    )
    stages = build_featurization(
        categorical_cols=["c0", "c1", "c2"],
        numeric_cols=["l_quantity"],
        label_col="clase",
        handle_invalid="keep",
    )
    from pyspark.ml import Pipeline as MLPipeline

    pipe = MLPipeline(
        stages=stages
        + [
            DeterministicLabelMasker(percentageLabeled=0.5, idCol="row_id", seed=11),
            Supervised(baseClassifier=DecisionTreeClassifier(seed=5, maxBins=42)),
        ]
    )
    model = pipe.fit(hands)
    m = evaluate_predictions(model.transform(hands))
    assert m.accuracy > 0.95  # class is a deterministic function of a feature

"""Co-Training estimator (reference C3: ``CoTraining.scala:122-253``,
algorithm: Blum & Mitchell 1998).

The reference's variant splits *instances*, not feature views: labeled
AND unlabeled pools are each split 50/50 with seed 8
(``CoTraining.scala:137-142``); two copies of the same base classifier
cross-teach — model 1's confident pseudo-labels are appended to model
2's labeled pool and vice versa (``:172-173``, ``:215-216``); the final
model is fit on the union of both labeled pools (``:251``). That
deviation from classic feature-split co-training is preserved for
parity (SURVEY.md §2.1 C3).

Same promotion criteria as SelfTraining (threshold / kBest; in kBest
the per-iteration budget comes from the TOTAL unlabeled count,
``CoTraining.scala:199``, and applies to each view). Same physical
re-engineering: isnan complementary-filter split, localCheckpoint per
iteration, arithmetic pool-size bookkeeping, codegen'd probMax.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Estimator
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfm_semisup_spark.operators.lineage import release
from tfm_semisup_spark.operators.results import SemiSupervisedSummary
from tfm_semisup_spark.operators.self_training import (
    SelfTrainingModel,
    _SSCParams,
    kbest_order,
    require_probabilistic,
)
from tfm_semisup_spark.functions.vector import prob_max

_SPLIT_SEED = 8  # reference: `CoTraining.scala:137,140`


class CoTraining(Estimator, _SSCParams):
    """Defaults mirror the reference (``CoTraining.scala:25-30``):
    threshold=0.7, maxIter=3, criterion='threshold', kBest=1.0."""

    @keyword_only
    def __init__(
        self,
        *,
        baseClassifier=None,
        threshold: float = 0.7,
        maxIter: int = 3,
        criterion: str = "threshold",
        kBest: float = 1.0,
        labelSelectionCol: str = "labelSelection",
        featuresCol: str = "features",
        labelCol: str = "label",
        checkpointDir: str = "",
    ):
        super().__init__()
        self.baseClassifier = baseClassifier
        self._setDefault(
            threshold=0.7,
            maxIter=3,
            criterion="threshold",
            kBest=1.0,
            labelSelectionCol="labelSelection",
            featuresCol="features",
            labelCol="label",
            checkpointDir="",
        )
        kwargs = dict(self._input_kwargs)
        kwargs.pop("baseClassifier", None)
        self._set(**kwargs)
        self.last_fit_summary: SemiSupervisedSummary | None = None

    def copy(self, extra=None):
        new = CoTraining(baseClassifier=self.baseClassifier)
        return self._copyValues(new, extra)

    def _score(self, model, pool: DataFrame) -> DataFrame:
        feats = self.getOrDefault(self.featuresCol)
        prob_col = model.getProbabilityCol() if hasattr(model, "getProbabilityCol") else "probability"
        return self._truncate_lineage(
            model.transform(pool)
            .withColumn("probMax", prob_max(prob_col))
            .select(feats, "prediction", "probMax")
        )

    def _promote(self, preds: DataFrame, k: int, n_pool: int):
        """Split one view's scored pool into (promoted, rest, n_promoted)."""
        criterion = self.getOrDefault(self.criterion)
        feats = self.getOrDefault(self.featuresCol)
        label = self.getOrDefault(self.labelCol)
        if criterion == "threshold":
            confident = F.col("probMax") > self.getOrDefault(self.threshold)
            promoted = preds.where(confident)
            rest = preds.where(~confident)
            n_promoted = promoted.count()
        else:
            promoted = preds.orderBy(*kbest_order(feats)).limit(k)
            rest = preds.exceptAll(promoted)
            n_promoted = min(k, n_pool)
        as_labeled = promoted.select(feats, F.col("prediction").alias(label))
        as_unlabeled = rest.select(feats, F.col("prediction").alias(label))
        return as_labeled, as_unlabeled, n_promoted

    def _fit(self, dataset: DataFrame) -> SelfTrainingModel:
        require_probabilistic(self.baseClassifier)
        criterion = self.getOrDefault(self.criterion)
        if criterion not in ("threshold", "kBest"):
            raise ValueError(f"unknown criterion {criterion!r}")
        base = self.baseClassifier
        max_iter = self.getOrDefault(self.maxIter)
        sel = self.getOrDefault(self.labelSelectionCol)
        feats = self.getOrDefault(self.featuresCol)
        label = self.getOrDefault(self.labelCol)

        counts = {
            row["unlabeled"]: row["n"]
            for row in dataset.groupBy(F.isnan(sel).alias("unlabeled"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_lab_ini = counts.get(False, 0)
        n_unlab_ini = counts.get(True, 0)

        labeled = dataset.where(~F.isnan(sel)).select(
            feats, F.col(label).cast("double").alias(label)
        )
        unlabeled = dataset.where(F.isnan(sel)).select(
            feats, F.col(label).cast("double").alias(label)
        )
        lab1, lab2 = labeled.randomSplit([0.5, 0.5], seed=_SPLIT_SEED)
        unlab1, unlab2 = unlabeled.randomSplit([0.5, 0.5], seed=_SPLIT_SEED)
        # checkpoint ALL four views before counting: the counts then scan
        # materialized data instead of re-running the upstream
        # featurization once per count() action
        lab1 = self._truncate_lineage(lab1)
        lab2 = self._truncate_lineage(lab2)
        unlab1 = self._truncate_lineage(unlab1)
        unlab2 = self._truncate_lineage(unlab2)
        n_unlab1 = unlab1.count()
        n_unlab2 = unlab2.count()
        n_lab1 = lab1.count()
        n_lab2 = lab2.count()

        model1 = base.fit(lab1)
        model2 = base.fit(lab2)
        it = 1

        k = 0
        if criterion == "kBest" and max_iter > 1:
            # budget from the TOTAL unlabeled pool (`CoTraining.scala:199`)
            k = int(round(self.getOrDefault(self.kBest) * n_unlab_ini / (max_iter - 1)))

        # pool_src_{1,2}: the checkpoint each view's `unlabX` lazily
        # reads from; freed once the round's scoring re-materializes it
        # into predsX (operators/lineage.py:release)
        pool_src1, pool_src2 = unlab1, unlab2
        while it < max_iter and n_unlab1 > 0 and n_unlab2 > 0:
            preds1 = self._score(model1, unlab1)
            preds2 = self._score(model2, unlab2)
            release(pool_src1)
            release(pool_src2)
            pool_src1, pool_src2 = preds1, preds2
            promo1, unlab1, n_promo1 = self._promote(preds1, k, n_unlab1)
            promo2, unlab2, n_promo2 = self._promote(preds2, k, n_unlab2)

            # cross-teaching: view 1 learns from view 2's confident labels
            # and vice versa (`CoTraining.scala:172-173`)
            grown1 = self._truncate_lineage(lab1.unionAll(promo2))
            grown2 = self._truncate_lineage(lab2.unionAll(promo1))
            release(lab1)
            release(lab2)
            lab1, lab2 = grown1, grown2
            n_unlab1 -= n_promo1
            n_unlab2 -= n_promo2
            n_lab1 += n_promo2
            n_lab2 += n_promo1

            if n_unlab1 > 0 and n_unlab2 > 0 and it < max_iter:
                model1 = base.fit(lab1)
                model2 = base.fit(lab2)
                it += 1

        summary = SemiSupervisedSummary(
            labeled_initial=n_lab_ini,
            unlabeled_initial=n_unlab_ini,
            labeled_final=n_lab1 + n_lab2,
            unlabeled_final=n_unlab1 + n_unlab2,
            iterations=it,
        )
        self.last_fit_summary = summary
        # final model: fit on the union of both views' pools
        # (`CoTraining.scala:251`)
        final_model = base.fit(lab1.unionAll(lab2))
        release(pool_src1)
        release(pool_src2)
        release(lab1)
        release(lab2)
        return SelfTrainingModel(final_model, summary)

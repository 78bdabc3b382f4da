"""Label-masking transformers (reference C1: ``UnlabeledTransformer.scala``).

Two implementations of the same semantics — "keep the label for a
fraction p of rows, set the rest to NaN in a new column":

- ``UnlabeledTransformer``: faithful re-expression of the reference
  (seeded ``randomSplit([p, 1-p])``, split 0 keeps ``label``, split 1
  gets ``label * NaN``, re-union — ``UnlabeledTransformer.scala:41-46``).
  randomSplit sorts each partition to make Bernoulli sampling stable,
  then scans the input twice (once per split) — fine at notebook scale.

- ``DeterministicLabelMasker``: the 100 TB path. One narrow projection:
  ``labelSelection = label WHERE pmod(xxhash64(id, seed), M) < p*M``.
  No sort, no double scan, no union; membership is a pure function of
  the id column, so it is reproducible across engines, partitionings
  and reruns (and DuckDB-checkable for tests).

NaN (not NULL) is the unlabeled sentinel, preserving the reference's
load-bearing convention (SURVEY.md §1.1) that every downstream
estimator splits on ``isnan``.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MASK_MODULUS = 1_000_000


class UnlabeledTransformer(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """Masks labels via seeded randomSplit (reference defaults:
    percentageLabeled=0.1, seed=11, output column 'labelSelection' —
    ``UnlabeledTransformer.scala:13-15``)."""

    percentageLabeled = Param(
        Params._dummy(),
        "percentageLabeled",
        "fraction of rows that keep their label",
        TypeConverters.toFloat,
    )
    seed = Param(Params._dummy(), "seed", "random seed", TypeConverters.toInt)
    labelCol = Param(
        Params._dummy(), "labelCol", "input label column", TypeConverters.toString
    )
    outputCol = Param(
        Params._dummy(), "outputCol", "masked label column", TypeConverters.toString
    )

    @keyword_only
    def __init__(
        self,
        *,
        percentageLabeled: float = 0.1,
        seed: int = 11,
        labelCol: str = "label",
        outputCol: str = "labelSelection",
    ):
        super().__init__()
        self._setDefault(
            percentageLabeled=0.1, seed=11, labelCol="label", outputCol="labelSelection"
        )
        self._set(**self._input_kwargs)

    def setPercentageLabeled(self, value: float) -> "UnlabeledTransformer":
        return self._set(percentageLabeled=value)

    def getPercentageLabeled(self) -> float:
        return self.getOrDefault(self.percentageLabeled)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        p = self.getOrDefault(self.percentageLabeled)
        seed = self.getOrDefault(self.seed)
        label = self.getOrDefault(self.labelCol)
        out = self.getOrDefault(self.outputCol)
        labeled, unlabeled = dataset.randomSplit([p, 1.0 - p], seed=seed)
        # split 0 keeps the label; split 1 gets label * NaN (the
        # reference's arithmetic). NULL input labels are coerced to the
        # NaN sentinel (== unlabeled): the reference's `label * NaN`
        # yields NULL for NULL, which every downstream isnan() split
        # silently DROPS — no-label rows should be unlabeled, not lost.
        lbl = F.col(label).cast("double")
        return labeled.withColumn(out, F.coalesce(lbl, F.lit(float("nan")))).unionAll(
            unlabeled.withColumn(
                out, F.coalesce(lbl * float("nan"), F.lit(float("nan")))
            )
        )


class DeterministicLabelMasker(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """Hash-based label masking: scalable, engine-reproducible variant.

    ``pmod(xxhash64(idCol, seed), 1e6) < p * 1e6`` keeps the label.
    A single narrow projection — the recommended masking strategy at
    100 TB (SURVEY.md §2.1 C1 note).
    """

    percentageLabeled = Param(
        Params._dummy(),
        "percentageLabeled",
        "fraction of rows that keep their label",
        TypeConverters.toFloat,
    )
    seed = Param(Params._dummy(), "seed", "hash seed", TypeConverters.toInt)
    idCol = Param(
        Params._dummy(), "idCol", "stable row-identity column", TypeConverters.toString
    )
    labelCol = Param(
        Params._dummy(), "labelCol", "input label column", TypeConverters.toString
    )
    outputCol = Param(
        Params._dummy(), "outputCol", "masked label column", TypeConverters.toString
    )

    @keyword_only
    def __init__(
        self,
        *,
        percentageLabeled: float = 0.1,
        seed: int = 11,
        idCol: str = "id",
        labelCol: str = "label",
        outputCol: str = "labelSelection",
    ):
        super().__init__()
        self._setDefault(
            percentageLabeled=0.1,
            seed=11,
            idCol="id",
            labelCol="label",
            outputCol="labelSelection",
        )
        self._set(**self._input_kwargs)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        p = self.getOrDefault(self.percentageLabeled)
        seed = self.getOrDefault(self.seed)
        keep = (
            F.pmod(
                F.xxhash64(F.col(self.getOrDefault(self.idCol)), F.lit(seed)),
                F.lit(_MASK_MODULUS),
            )
            < int(p * _MASK_MODULUS)
        )
        label = F.col(self.getOrDefault(self.labelCol)).cast("double")
        # NULL labels coerce to the NaN sentinel (unlabeled) rather than
        # propagating NULL, which downstream isnan() splits would drop
        return dataset.withColumn(
            self.getOrDefault(self.outputCol),
            F.coalesce(
                F.when(keep, label).otherwise(label * float("nan")),
                F.lit(float("nan")),
            ),
        )

"""Featurization layer (SURVEY.md §7 step 3).

Re-expression of the reference's per-dataset featurization:

- ``indexStringColumnsStagePipeline`` (`FunctionsSemiSupervised.scala:32-42`)
  built one StringIndexer per categorical column in a Scala loop; since
  Spark 3.0 a single multi-column StringIndexer does the same with one
  pass over the data per distinct-value scan.
- notebook pattern: VectorAssembler over remaining numeric columns +
  label StringIndexer (`SemiSupervisedAndBaseClassifiers.scala:61-70`).

Also provides ``ArrayToVector`` for the testdata's embeddings table
(array<float> -> ml Vector), keeping feature tables SQL-inspectable
until the last moment.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CATEGORICAL_SUFFIX = "-num"


def build_featurization(
    categorical_cols: list[str],
    numeric_cols: list[str],
    label_col: str | None = None,
    handle_invalid: str = "keep",
) -> list[Transformer]:
    """Stages: [multi-col StringIndexer?, label StringIndexer?, VectorAssembler].

    Output columns: ``features`` (Vector), ``label`` (double, indexed)
    — the canonical labeled-point schema (FIXTURES.md A5).
    """
    stages: list = []
    feature_cols = list(numeric_cols)
    if categorical_cols:
        indexed = [c + CATEGORICAL_SUFFIX for c in categorical_cols]
        stages.append(
            StringIndexer(
                inputCols=list(categorical_cols),
                outputCols=indexed,
                handleInvalid=handle_invalid,
            )
        )
        feature_cols += indexed
    if label_col is not None:
        stages.append(
            StringIndexer(inputCol=label_col, outputCol="label", handleInvalid="skip")
        )
    stages.append(VectorAssembler(inputCols=feature_cols, outputCol="features"))
    return stages


class ArrayToVector(
    Transformer, DefaultParamsReadable, DefaultParamsWritable
):
    """array<numeric> column -> ml VectorUDT column (for MLlib estimators).

    Uses pyspark.ml.functions.array_to_vector — JVM-side conversion, no
    Python boundary.
    """

    inputCol = Param(
        Params._dummy(), "inputCol", "input array column", TypeConverters.toString
    )
    outputCol = Param(
        Params._dummy(), "outputCol", "output vector column", TypeConverters.toString
    )

    @keyword_only
    def __init__(self, *, inputCol: str = "embedding", outputCol: str = "features"):
        super().__init__()
        self._setDefault(inputCol="embedding", outputCol="features")
        self._set(**self._input_kwargs)

    def getInputCol(self) -> str:
        return self.getOrDefault(self.inputCol)

    def getOutputCol(self) -> str:
        return self.getOrDefault(self.outputCol)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        from pyspark.ml.functions import array_to_vector

        return dataset.withColumn(
            self.getOutputCol(),
            array_to_vector(F.col(self.getInputCol()).cast("array<double>")),
        )


class ColumnCaster(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """Cast a column (reference: Adult string->double casts,
    ``SemiSupervisedAndBaseClassifiers.scala:320-324``) as a Pipeline stage."""

    inputCol = Param(Params._dummy(), "inputCol", "column to cast", TypeConverters.toString)
    dtype = Param(Params._dummy(), "dtype", "target data type", TypeConverters.toString)

    @keyword_only
    def __init__(self, *, inputCol: str = "label", dtype: str = "double"):
        super().__init__()
        self._setDefault(inputCol="label", dtype="double")
        self._set(**self._input_kwargs)

    def _transform(self, dataset: DataFrame) -> DataFrame:
        col = self.getOrDefault(self.inputCol)
        return dataset.withColumn(col, F.col(col).cast(self.getOrDefault(self.dtype)))


def transform_schema_identity(schema: StructType) -> StructType:
    return schema

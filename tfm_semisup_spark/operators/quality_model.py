"""Model-based quality filtering: distill the rule chain into a
trained classifier.

The modern corpus-prep pattern (GPT-3's quality filter against a
curated positive set, Rae et al. 2021 §A1.2, FineWeb-Edu's distilled
classifier — all public): heuristic rules label a SEED set, a cheap
linear model generalizes the signal, and the MODEL scores the corpus —
catching documents the rules mis-bucket and replacing hard boolean
gates with a tunable probability threshold.

Spark-first shape:

- weak labels come from the existing Gopher rule chain
  (``operators/quality.py``) on a hash-selected training split — the
  repo's partitioning-independent sampling pattern;
- features are stateless (RegexTokenizer -> HashingTF; no fitted
  vocabulary, no ordering nondeterminism — see text_pipeline.py);
- the model is MLlib LogisticRegression: coefficients are a tiny
  broadcast vector, scoring is one narrow JVM projection over the
  corpus — at 100 TB the expensive part is exactly one scan;
- training cost is bounded by the SEED split, not the corpus.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfm_semisup_spark.operators.quality import with_quality_flags


def train_quality_model(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_mod: int = 2,
    num_features: int = 1 << 15,
    **rule_overrides,
) -> PipelineModel:
    """Fit the distilled quality classifier on the hash-selected seed
    split (``xxhash64(id) % train_mod == 0``), weak-labeled by the
    Gopher rule chain. Returns the fitted PipelineModel."""
    seed_docs = docs.where(F.abs(F.xxhash64(F.col(id_col))) % train_mod == 0)
    labeled = with_quality_flags(seed_docs, text_col, **rule_overrides).withColumn(
        "label", F.col("quality_pass").cast("double")
    )
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__toks", pattern=r"\s+", minTokenLength=1
            ),
            HashingTF(
                inputCol="__toks", outputCol="__features", numFeatures=num_features
            ),
            LogisticRegression(
                featuresCol="__features",
                labelCol="label",
                maxIter=30,
                regParam=0.01,
                standardization=False,
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(
    model: PipelineModel, docs: DataFrame, keep_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Corpus scoring pass: one narrow projection adding
    ``quality_prob`` (P(high quality)). The fitted coefficients ride
    along as a broadcast; nothing shuffles."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    # probability vector is [P(0), P(1)]; take P(1) explicitly

    return scored.select(
        *keep_cols,
        F.get(vector_to_array("probability"), 1).alias("quality_prob"),
    )


def quality_filter_by_model(
    model: PipelineModel, docs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """The filter form: keep documents the model scores above
    threshold — the tunable replacement for the boolean rule gate."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    return scored.where(
        F.get(vector_to_array("probability"), 1) >= threshold
    ).select(*docs.columns)

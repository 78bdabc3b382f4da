"""Text featurization pipeline (SURVEY.md §2.3 text analysis).

Spark ML text stages composed the idiomatic way: RegexTokenizer ->
StopWordsRemover -> (NGram) -> HashingTF -> IDF. HashingTF is chosen
over CountVectorizer for the scale path: it is stateless (no vocabulary
fit/broadcast, no ordering nondeterminism) and a 100 TB corpus never
builds a driver-side vocab. CountVectorizer remains available via
``use_count_vectorizer=True`` for when an explicit vocabulary matters.

CountVectorizer determinism audit (ROADMAP): the fitted vocabulary is
ordered by descending term frequency with ties broken by the order
terms arrive at the driver — which is PARTITIONING-SENSITIVE. Two
consequences, proven in tests/test_sources.py:
- the vocabulary SET (and each term's index, given distinct counts) is
  stable across repartitionings when ``vocabSize`` >= distinct terms;
- when ``vocabSize`` TRUNCATES inside a tied-frequency band, which
  tied terms survive can differ between partitionings — so any
  rows-only query built on an explicit vocab must either avoid
  truncation or pre-aggregate counts and pick the vocab itself with a
  (count, term) sort. The corpus path sidesteps all of this:
  HashingTF has no fitted state at all.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    HashingTF,
    NGram,
    RegexTokenizer,
    StopWordsRemover,
)


def build_text_pipeline(
    input_col: str = "text",
    output_col: str = "tfidf",
    ngram: int | None = None,
    num_features: int = 1 << 18,
    use_count_vectorizer: bool = False,
    vocab_size: int = 1 << 16,
) -> Pipeline:
    stages = [
        RegexTokenizer(
            inputCol=input_col, outputCol="__tokens", pattern=r"\s+", minTokenLength=1
        ),
        StopWordsRemover(inputCol="__tokens", outputCol="__clean"),
    ]
    term_col = "__clean"
    if ngram is not None and ngram > 1:
        stages.append(NGram(n=ngram, inputCol="__clean", outputCol="__ngrams"))
        term_col = "__ngrams"
    if use_count_vectorizer:
        stages.append(
            CountVectorizer(inputCol=term_col, outputCol="__tf", vocabSize=vocab_size)
        )
    else:
        stages.append(
            HashingTF(inputCol=term_col, outputCol="__tf", numFeatures=num_features)
        )
    stages.append(IDF(inputCol="__tf", outputCol=output_col))
    return Pipeline(stages=stages)

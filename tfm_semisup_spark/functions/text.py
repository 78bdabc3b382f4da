"""Text-analysis columnar helpers (extension surface, SURVEY.md §2.3).

All JVM-side expressions; designed so a 100 TB documents table never
crosses into Python. Tokenization is whitespace-based to stay
portable between Spark (Java regex) and the DuckDB oracle (RE2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def whitespace_tokens(text: Column) -> Column:
    """Split on runs of whitespace; empty strings filtered out."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(whitespace_tokens(text))


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-grams from a token array, via sequence+transform (no UDF).

    PERFORMANCE: pass a *bound column* (``withColumn`` the token array
    first), not a split expression — Catalyst inlines expression
    arguments into the lambda body, so a split expression would be
    re-evaluated per n-gram (O(tokens²) per row; measured 5x slowdown
    on the shingle path). ``slice`` copies only n elements per n-gram.
    """
    idx = F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1))
    return F.when(F.size(tokens) >= n, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n))
    )).otherwise(F.array().cast("array<string>"))


def hashed_word_ngrams(tokens: Column, n: int) -> Column:
    """xxhash64'd word n-grams in ONE transform pass.

    Fuses ``transform(word_ngrams(w, n), s -> xxhash64(s))`` — which
    runs TWO interpreted passes and materializes the intermediate
    n-gram STRING array per row — into a single lambda that hashes
    each gram as it is built. Same hash values (xxhash64 of the same
    space-joined gram text), half the interpreted work and no string
    array allocation. Same binding caveat as ``word_ngrams``: pass a
    bound token column, not a split expression."""
    idx = F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1))
    return F.when(
        F.size(tokens) >= n,
        F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i, n)))),
    ).otherwise(F.array().cast("array<bigint>"))


def char_ngrams(text: Column, n: int) -> Column:
    """Character n-gram shingles, via substr over an index sequence."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - F.lit(n - 1), F.lit(0)))
    return F.transform(idx, lambda i: text.substr(i, F.lit(n)))

"""Gopher/C4-style document-quality rule chain.

Heuristic quality filtering is the workhorse of LLM-corpus prep (Rae et
al. 2021 "Gopher" §A1.1; Raffel et al. 2020 "C4" §2.2 — both public).
This module re-expresses the standard rule family as pure columnar
Spark expressions — one narrow projection pass, no UDFs, no shuffle —
so at 100 TB the filter runs at scan speed and pushes nothing to
Python. Every rule is a named boolean column; reporting and filtering
share the same expressions so what you measure is what you drop.

Rules (names are the public heuristics, thresholds tuned to the
synthetic corpus so each rule has live kill-signal in tests):

- ``word_count``: n_words within [min_words, max_words] (Gopher: 50-100k).
- ``mean_word_len``: mean token length within [min_mwl, max_mwl]
  (Gopher: 3-10).
- ``alpha_ratio``: fraction of tokens containing an alphabetic char
  >= min_alpha (Gopher: 0.8 "80% words contain an alphabetic char").
- ``type_token_ratio``: distinct-token fraction >= min_ttr — the
  columnar stand-in for Gopher's repetition rules (a low TTR is
  exactly a high repeated-fraction).
- ``stopword_signal``: >= min_stop distinct stopwords present
  (Gopher's "contains >= 2 of a stop-word set").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a")

DEFAULTS = dict(
    min_words=20,
    max_words=1000,
    min_mwl=3.0,
    max_mwl=8.0,
    min_alpha=0.8,
    min_ttr=0.35,
    min_stop=2,
)


def quality_rules(text_col: str = "text", **overrides) -> dict[str, Column]:
    """name -> boolean pass/fail Column. All expressions derive from a
    single bound token array (bind-before-use: Catalyst inlines lambda
    arguments, so deriving each rule from `F.split(...)` inline would
    re-split per rule — same trap as SCALE.md's shingling lesson)."""
    unknown = set(overrides) - set(DEFAULTS)
    if unknown:
        # fail loudly at the call site: **kwargs otherwise swallows
        # typos (and legacy kwargs like the removed `seed`) silently
        # or surfaces them as a confusing downstream error (ADVICE r3)
        raise TypeError(
            f"unknown quality rule override(s) {sorted(unknown)}; "
            f"valid: {sorted(DEFAULTS)}"
        )
    p = {**DEFAULTS, **overrides}
    w = F.filter(F.split(text_col, " "), lambda t: t != "")
    n = F.size(w)
    # null divisor on empty docs (ANSI mode forbids /0): ratios go null,
    # rules coalesce to false downstream — fail-closed, never a throw
    nz = F.when(n > 0, n)
    mwl = F.aggregate(
        w, F.lit(0), lambda acc, t: acc + F.length(t), lambda acc: acc * 1.0 / nz
    )
    alpha = F.size(F.filter(w, lambda t: t.rlike("[a-z]"))) * 1.0 / nz
    ttr = F.size(F.array_distinct(w)) * 1.0 / nz
    stop = F.size(
        F.array_distinct(F.filter(w, lambda t: t.isin(list(STOPWORDS))))
    )
    return {
        "word_count": (n >= p["min_words"]) & (n <= p["max_words"]),
        "mean_word_len": (mwl >= p["min_mwl"]) & (mwl <= p["max_mwl"]),
        "alpha_ratio": alpha >= p["min_alpha"],
        "type_token_ratio": ttr >= p["min_ttr"],
        "stopword_signal": stop >= p["min_stop"],
    }


def with_quality_flags(
    docs: DataFrame, text_col: str = "text", **overrides
) -> DataFrame:
    """Append one boolean column per rule plus ``quality_pass`` (AND of
    all). Empty/whitespace-only docs fail every ratio rule by
    definition (flags coalesce to false, never null)."""
    rules = quality_rules(text_col, **overrides)
    out = docs
    for name, cond in rules.items():
        out = out.withColumn(name, F.coalesce(cond, F.lit(False)))
    pass_all = F.lit(True)
    for name in rules:
        pass_all = pass_all & F.col(name)
    return out.withColumn("quality_pass", pass_all)


def filter_quality_gopher(
    docs: DataFrame, text_col: str = "text", **overrides
) -> DataFrame:
    """Keep only docs passing every rule — the filter form. One narrow
    where(); flags are not materialized in the output."""
    rules = quality_rules(text_col, **overrides)
    cond = F.lit(True)
    for c in rules.values():
        cond = cond & c
    return docs.where(F.coalesce(cond, F.lit(False)))

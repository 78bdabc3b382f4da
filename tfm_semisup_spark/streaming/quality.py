"""Streaming quality gate: the Gopher/C4 rule chain applied AT ingest.

A live pipeline should drop junk before it ever lands in the corpus
table. Because the batch rule chain (``operators/quality.py``) is pure
columnar expressions — no fitted state, no aggregation — it applies to
an unbounded DataFrame verbatim: ONE definition, two execution modes,
guaranteed-identical pass/fail decisions between the nightly batch
audit and the ingest stream (asserted stream==batch in
tests/test_streaming_smoke.py).

Scale shape: a narrow per-row projection at scan speed; no watermark,
no state store, no shuffle — quality gating adds zero streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tfm_semisup_spark.operators.quality import with_quality_flags


def stream_quality_filter(
    docs: DataFrame, text_col: str = "text", **rule_overrides
) -> DataFrame:
    """Keep only rule-passing documents from an unbounded docs stream.

    Identical expressions to the batch ``filter_quality_gopher``; the
    flag columns are dropped so the sink schema equals the input
    schema (a gate, not an audit — the audit form is the batch
    ``quality_rule_report``)."""
    flagged = with_quality_flags(docs, text_col, **rule_overrides)
    return flagged.where(flagged["quality_pass"]).select(*docs.columns)

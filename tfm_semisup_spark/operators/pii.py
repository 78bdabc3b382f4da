"""PII detection + redaction over text columns.

A training-corpus pipeline must find and mask personally identifiable
information before anything downstream sees the text (public practice:
C4 strips lines by keyword; BigScience ROOTS and Dolma run regex/NER
redaction passes). This module is the regex tier — the one that runs
at scan speed on 100 TB:

- pure columnar ``regexp_extract_all`` / ``regexp_replace`` (JVM,
  whole-stage codegen) — no UDFs, no shuffle; the pass is a narrow
  projection pipelined into whatever filter/write follows;
- patterns are anchored to token boundaries and kept to the regex
  subset with identical semantics in Java regex (Spark) and RE2
  (DuckDB oracle), so the same rule text is verifiable in both
  engines;
- detection and redaction share one compiled pattern per PII class:
  what you count is exactly what you mask.

An NER tier (model-based) would slot behind the same column contract
via mapInPandas, like operators/multimodal.py stubs the media decode —
deliberately out of scope here (no model runtime in-container).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern subset valid in BOTH Java regex and RE2: character classes,
# bounded repetition, \b word boundaries. No lookarounds (RE2 lacks
# them), no possessive quantifiers.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{4}\b",
}


def pii_counts(text_col: str | Column = "text") -> dict[str, Column]:
    """name -> int Column: occurrences of each PII class in the text."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }


def redact(text_col: str | Column = "text") -> Column:
    """Text with every PII match replaced by its <CLASS> token. One
    chained columnar expression — order is fixed (email before ipv4:
    an IP can be the host part of a mangled email, never the reverse)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, pat in PII_PATTERNS.items():
        col = F.regexp_replace(col, pat, f"<{name.upper()}>")
    return col


def with_pii_columns(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_<class> count columns, ``pii_any`` and ``redacted``.
    Narrow projection — composes with CorpusPipeline stages."""
    out = docs
    any_pii = F.lit(False)
    for name, cnt in pii_counts(text_col).items():
        out = out.withColumn(f"n_{name}", cnt)
        any_pii = any_pii | (F.col(f"n_{name}") > 0)
    return out.withColumn("pii_any", any_pii).withColumn(
        "redacted", redact(text_col)
    )

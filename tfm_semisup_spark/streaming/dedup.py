"""Streaming corpus-ingest deduplication.

A live training-data pipeline ingests documents continuously; dedup
must happen AT ingest, not in a nightly batch. Two streaming tiers,
mirroring the batch surface in queries/dedup.py:

- ``stream_exact_dedup``: within-stream exact dedup via content
  fingerprint + ``dropDuplicatesWithinWatermark``. The state store
  holds only fingerprints younger than the watermark horizon — BOUNDED
  state, the property that matters on an unbounded 100 TB/day feed
  (plain ``dropDuplicates`` keys state forever and OOMs the state
  store). A duplicate arriving later than the horizon is admitted —
  the standard watermark contract; the nightly batch pass
  (``dedup_exact_keepers``) is the backstop, exactly how production
  pipelines layer it.

- ``stream_new_docs_vs_corpus``: stream-static LEFT ANTI join against
  the already-ingested corpus fingerprint set — the streaming twin of
  ``dedup_incremental_new_docs``. The static side is re-read per
  micro-batch (so a concurrently-growing fingerprint table is picked
  up) and broadcasts while small; at corpus scale it becomes a
  shuffled stream-static join and the fingerprint table should be
  bucketed by fp to keep it exchange-free.

Both are expression-only transforms on an unbounded DataFrame — the
same md5 fingerprint used by every batch dedup query, so batch and
streaming agree on what "duplicate" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop in-stream exact duplicates (by md5(text)) with state
    bounded by the event-time watermark."""
    return (
        docs.withColumn("fp", F.md5(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def stream_new_docs_vs_corpus(
    docs: DataFrame, known_fps: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Pass only documents whose fingerprint is absent from the known
    corpus set (``known_fps``: one ``fp`` column, md5 hex)."""
    return docs.withColumn("fp", F.md5(text_col)).join(
        known_fps, "fp", "left_anti"
    )

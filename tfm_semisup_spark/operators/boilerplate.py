"""Line-level boilerplate removal (corpus-prep extension surface).

Web-corpus pipelines drop LINES that repeat across many documents —
navigation bars, cookie banners, "subscribe" footers — before any
document-level dedup (public practice: CCNet's paragraph-frequency
filter, RefinedWeb/Dolma line-dedup passes). Document-level near-dup
cannot catch these: two documents sharing only a footer are not
near-duplicates, yet a 100 TB crawl carries the same footer billions
of times.

Semantics: a document is a sequence of "lines"; a line occurring in at
least ``min_docs`` DISTINCT documents is boilerplate, and removal
re-assembles each document from its surviving lines in order. The
synthetic corpus has no newlines, so the line analog is a
NON-OVERLAPPING window of ``line_tokens`` whitespace words — the
operator takes the already-exploded (id, pos, line) shape, so a real
corpus plugs in ``split(text, '\\n')`` instead without touching the
frequency/removal logic.

Spark-first shape, one corpus shuffle end-to-end:

1. **segment** — narrow projection: tokenize, window, posexplode.
2. **frequency** — ``groupBy xxhash64(line)`` with map-side combine on
   8-byte keys, counting DISTINCT docs (``count_distinct`` over the
   (hash, doc) pre-distinct); only hashes with count >= min_docs
   survive the HAVING, so the boilerplate set is orders of magnitude
   smaller than the corpus (bounded above by N*lines/min_docs, in
   practice the handful of true templates).
3. **mark** — left join segments to the boilerplate set; AQE broadcasts
   it when (as always in practice) it is small, so the corpus side does
   not shuffle here.
4. **reassemble** — one groupBy(doc) collecting (pos, line) structs,
   ``array_sort`` + ``array_join`` (null lines — the removed ones —
   are filtered by array_join's null semantics). This is THE corpus
   shuffle; there is no shape that rebuilds documents without keying
   by document once.

Deterministic: pure functions of the text, no sampling, no
partitioning sensitivity. xxhash64 keys trade an astronomically
unlikely 64-bit collision (two distinct lines counted as one) for
8-byte shuffle keys — the same trade as ``hashed_shingles``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_word_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_tokens: int = 10,
) -> DataFrame:
    """Explode each document into non-overlapping ``line_tokens``-word
    "lines": (input columns minus text) + (pos, line). ``pos`` is the
    1-based word offset of the line's first word, so surviving lines
    re-join in document order. Documents with no words yield no rows
    (callers that must keep them re-join on id afterwards)."""
    words = F.filter(
        F.split(F.col(text_col), " "), lambda t: t != F.lit("")
    )
    segs = F.transform(
        F.sequence(F.lit(1), F.size(words), F.lit(line_tokens)),
        lambda s: F.struct(
            s.alias("pos"),
            F.array_join(F.slice(words, s, line_tokens), " ").alias("line"),
        ),
    )
    keep = [c for c in docs.columns if c != text_col]
    # NO where() on the computed array: a filter referencing the heavy
    # tokenize expression gets pushed below any caller repartition into
    # the (single-split) scan's DataFilter with the whole pipeline
    # inlined, running it once single-threaded and again in the real
    # projection (the hashed_shingles lesson, SCALE.md). The empty-doc
    # guard lives INSIDE the expression: If evaluates lazily (so
    # sequence(1, 0, …) never runs) and explode of the NULL branch
    # emits zero rows — same semantics, no Filter node.
    guarded = F.when(F.size(words) >= 1, segs)
    return (
        docs.select(*keep, F.explode(guarded).alias("__seg"))
        .select(*keep, F.col("__seg.pos").alias("pos"), F.col("__seg.line").alias("line"))
    )


def boilerplate_line_set(
    lines: DataFrame,
    min_docs: int,
    id_col: str = "doc_id",
    line_col: str = "line",
) -> DataFrame:
    """(line_h, n_docs) for every line occurring in >= ``min_docs``
    distinct documents. Two-stage distinct-then-count keeps the
    per-key state a counter (no count_distinct hash sets at scale).
    Reuses a precomputed ``line_h`` column when the input carries one
    (the single-hash-pass shape of ``remove_boilerplate_lines``)."""
    hashed = (
        lines.select("line_h", F.col(id_col))
        if "line_h" in lines.columns
        else lines.select(F.xxhash64(line_col).alias("line_h"), F.col(id_col))
    )
    return (
        hashed.distinct()
        .groupBy("line_h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_tokens: int = 10,
    min_docs: int = 30,
    cache_lines: bool = True,
) -> DataFrame:
    """Per-document removal summary: (non-text input columns,
    n_segments, n_boilerplate, clean_text). ``clean_text`` is the
    document re-assembled from its non-boilerplate lines in order
    (empty string when every line was boilerplate). Documents with no
    words are KEPT, with n_segments = 0 and clean_text = '' (the
    summary left-joins back onto the input, so removal never changes
    the corpus row count).

    ``cache_lines`` persists the segmented+hashed line table — it has
    TWO consumers (the frequency count and the mark join), and without
    the cache the tokenize/window/explode pass (the operator's
    dominant cost) runs twice; the cache is released as soon as the
    summary materializes (measured at sf0.1: 15.4s -> ~half)."""
    from tfm_semisup_spark.operators.lineage import truncate

    lines = segment_word_lines(docs, text_col, id_col, line_tokens).withColumn(
        "line_h", F.xxhash64("line")
    )
    if cache_lines:
        lines = lines.persist()
    bp = boilerplate_line_set(lines, min_docs, id_col)
    keep = [c for c in docs.columns if c != text_col]
    marked = (
        lines.join(bp, "line_h", "left")
        .select(
            id_col,
            "pos",
            "line",
            F.col("n_docs").isNotNull().alias("bp"),
        )
    )
    summary = (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("bp"), 1).otherwise(0)).cast("long").alias(
                "n_boilerplate"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "pos",
                                F.when(~F.col("bp"), F.col("line")).alias("line"),
                            )
                        )
                    ),
                    lambda x: x["line"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    # left join back onto the input so wordless documents survive with
    # an empty summary instead of silently vanishing from the corpus
    out = docs.select(*keep).join(summary, id_col, "left").select(
        *keep,
        F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
        F.coalesce("n_boilerplate", F.lit(0)).cast("long").alias("n_boilerplate"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
    if cache_lines:
        # materialize the summary, then free the line cache — a
        # long-lived session must not keep the exploded corpus pinned
        out = truncate(out)
        lines.unpersist()
    return out

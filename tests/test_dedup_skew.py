"""Hot-shingle skew: proves the DF-capped tier is the corpus-safe
default (VERDICT r1 #5 / ADVICE).

Adversarial corpus: every document shares one hot trigram (think a
boilerplate header). The uncapped shared-shingle join then generates
C(n_docs, 2) candidate pairs from that single shingle — quadratic.
The DF cap drops it, bounding candidate volume at C(cap, 2) per
shingle, while true near-duplicates (sharing many LOW-frequency
shingles) are still found.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.queries.dedup import (
    DF_CAP,
    candidate_pair_volume,
    df_capped_index,
    jaccard_pairs_from_index,
    shingled_docs,
)

N_DOCS = 300
HOT = "common boilerplate header"


def _adversarial_docs(spark):
    # doc i: hot trigram + 8 unique-to-i words (6 unique shingles);
    # docs 0 and 1 are planted near-dups (same unique tail, one word off)
    rows = []
    for i in range(N_DOCS):
        tail_seed = 0 if i == 1 else i  # doc 1 copies doc 0's tail
        tail = " ".join(f"w{tail_seed}x{j}" for j in range(8))
        if i == 1:
            tail = tail.replace("x7", "x7b")  # near, not exact
        rows.append((i, f"{HOT} {tail}"))
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_uncapped_candidate_volume_is_quadratic_capped_is_bounded(spark):
    docs = _adversarial_docs(spark)
    tri = shingled_docs(docs).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    uncapped = candidate_pair_volume(tri)
    capped = candidate_pair_volume(df_capped_index(tri, DF_CAP))

    # the hot shingle alone contributes C(300,2) = 44850 to the uncapped join
    assert uncapped >= N_DOCS * (N_DOCS - 1) // 2
    # capped: every surviving shingle has df <= DF_CAP; volume collapses
    assert capped <= uncapped / 50
    # the bound is structural: sum over shingles of C(min(df, cap), 2)
    assert capped <= DF_CAP * (DF_CAP - 1) // 2 * tri.select("shingle").distinct().count()


def test_hot_shingle_dropped_but_near_dup_still_found(spark):
    docs = _adversarial_docs(spark)
    tri = shingled_docs(docs).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    kept = df_capped_index(tri, DF_CAP)
    # the planted hot shingle is gone from the index
    assert kept.where(F.col("shingle").startswith("common boilerplate")).count() == 0

    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    pairs = jaccard_pairs_from_index(kept, sizes, 0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in found  # the true near-dup survives the cap
    # and nothing else pairs up: all other docs share only the hot shingle
    assert found == {(0, 1)}


def test_substring_cut_list_planted_span(spark):
    """A 20-token span planted verbatim in two documents is emitted as
    one maximal cut span in EACH doc at the right offsets; unique-text
    docs emit nothing; apply_cut_list removes exactly the spans."""
    from tfm_semisup_spark.queries.dedup import apply_cut_list, substring_cut_spans

    span = " ".join(f"dup{j}" for j in range(20))
    docs = spark.createDataFrame(
        [
            # doc 0: 5 unique tokens, then the span (positions 6..25)
            (0, " ".join(f"a{j}" for j in range(5)) + " " + span),
            # doc 1: span first (positions 1..20), then 10 unique tokens
            (1, span + " " + " ".join(f"b{j}" for j in range(10))),
            # doc 2: all unique, long enough to gram
            (2, " ".join(f"c{j}" for j in range(30))),
        ],
        "doc_id int, text string",
    )
    cuts = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in substring_cut_spans(docs).collect()
    }
    assert cuts == {(0, 6, 25, 20), (1, 1, 20, 20)}

    cleaned = {
        r["doc_id"]: r["text"]
        for r in apply_cut_list(docs, substring_cut_spans(docs)).collect()
    }
    assert cleaned[0] == " ".join(f"a{j}" for j in range(5))
    assert cleaned[1] == " ".join(f"b{j}" for j in range(10))
    assert cleaned[2] == " ".join(f"c{j}" for j in range(30))

"""Unit tests for the round-4 extension operators beyond oracle
parity: boilerplate line removal, PageRank, the bloom screen's
containment property, and weighted-reservoir determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tfm_semisup_spark.operators.boilerplate import (
    boilerplate_line_set,
    remove_boilerplate_lines,
    segment_word_lines,
)
from tfm_semisup_spark.operators.pagerank import pagerank
from tests.conftest import SF_DIR


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_removes_exactly_the_planted_line(spark):
    footer = "one two three four five six seven eight nine ten"
    bodies = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2: "lambda mu nu xi omicron pi rho sigma tau upsilon",
        3: "red green blue cyan magenta yellow black white gray pink",
    }
    rows = [(i, f"{footer} {body}") for i, body in bodies.items()]
    rows.append((4, "solo document with no shared lines at all here yes"))
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            _mkdocs(spark, rows), line_tokens=10, min_docs=3
        ).collect()
    }
    for i, body in bodies.items():
        assert out[i]["n_boilerplate"] == 1
        assert out[i]["clean_text"] == body
    assert out[4]["n_boilerplate"] == 0
    assert out[4]["clean_text"] == "solo document with no shared lines at all here yes"


def test_boilerplate_all_lines_removed_yields_empty_text(spark):
    line = "a b c d e"
    docs = _mkdocs(spark, [(i, line) for i in range(4)])
    out = remove_boilerplate_lines(docs, line_tokens=5, min_docs=4).collect()
    assert all(r["clean_text"] == "" and r["n_boilerplate"] == 1 for r in out)


def test_segmenting_is_non_overlapping_and_ordered(spark):
    docs = _mkdocs(spark, [(1, "w1 w2 w3 w4 w5 w6 w7")])
    segs = sorted(
        segment_word_lines(docs, line_tokens=3).collect(), key=lambda r: r["pos"]
    )
    assert [(r["pos"], r["line"]) for r in segs] == [
        (1, "w1 w2 w3"),
        (4, "w4 w5 w6"),
        (7, "w7"),
    ]


def test_boilerplate_set_threshold(spark):
    docs = _mkdocs(spark, [(1, "x y"), (2, "x y"), (3, "p q")])
    lines = segment_word_lines(docs, line_tokens=2)
    assert boilerplate_line_set(lines, min_docs=2).count() == 1
    assert boilerplate_line_set(lines, min_docs=3).count() == 0


def test_pagerank_uniform_on_a_cycle(spark):
    # symmetric ring: regular graph -> stationary distribution uniform
    n = 6
    edges = []
    for i in range(n):
        j = (i + 1) % n
        edges += [(i, j), (j, i)]
    ranks = pagerank(
        spark.createDataFrame(edges, "src long, dst long"), iters=5
    ).collect()
    assert len(ranks) == n
    for r in ranks:
        assert math.isclose(r["rank"], 1.0 / n, rel_tol=1e-9)


def test_pagerank_mass_conserved_and_hub_ranks_highest(spark):
    # star with a hub 0 joined to 1..4, symmetric
    edges = []
    for i in range(1, 5):
        edges += [(0, i), (i, 0)]
    ranks = {r["node"]: r["rank"] for r in pagerank(
        spark.createDataFrame(edges, "src long, dst long"), iters=8
    ).collect()}
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-9)
    assert all(ranks[0] > ranks[i] for i in range(1, 5))
    # leaves are symmetric -> identical ranks
    leaf = ranks[1]
    assert all(math.isclose(ranks[i], leaf, rel_tol=1e-12) for i in range(2, 5))


def test_pagerank_driver_and_distributed_paths_agree(spark):
    # lollipop: triangle 0-1-2 plus a tail 2-3-4, symmetric
    und = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}
    dist = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=5, small_graph_max_edges=0).collect()
    }
    assert set(fast) == set(dist)
    for node in fast:
        assert math.isclose(fast[node], dist[node], rel_tol=1e-12), node


def test_bloom_candidates_contain_all_exact_hits(spark):
    from tfm_semisup_spark.queries.contamination import (
        bloom_contamination_screen,
        contamination_screen,
    )

    bloom = {
        r["source"]: r for r in bloom_contamination_screen(spark, SF_DIR).collect()
    }
    exact = {r["source"]: r for r in contamination_screen(spark, SF_DIR).collect()}
    # no false negatives: every exact-contaminated doc count is covered
    for src, row in exact.items():
        assert src in bloom
        assert bloom[src]["n_verified"] == row["n_contaminated"]
        assert bloom[src]["n_candidate"] >= row["n_contaminated"]


def test_weighted_reservoir_partitioning_independent(spark):
    from tfm_semisup_spark.queries.corpus_prep import weighted_reservoir_sample

    from tfm_semisup_spark.io import load_table

    base = weighted_reservoir_sample(spark, SF_DIR).collect()
    # deterministic: a second run selects the identical ordered sample
    again = weighted_reservoir_sample(spark, SF_DIR).collect()
    assert [r["doc_id"] for r in base] == [r["doc_id"] for r in again]
    # weights bias the sample: mean sampled length exceeds corpus mean
    corpus_mean = load_table(spark, SF_DIR, "documents").agg(
        F.avg("n_chars")
    ).head()[0]
    sample_mean = sum(r["n_chars"] for r in base) / len(base)
    assert sample_mean > corpus_mean


def test_prefix_jaccard_equals_inverted_index_tier(spark):
    """Prefix filtering is lossless: identical verified pair set (and
    values) as the full inverted-index exact tier."""
    from tfm_semisup_spark.queries.dedup import (
        dedup_ngram_jaccard_pairs,
        dedup_prefix_jaccard_pairs,
    )

    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard_pairs(spark, SF_DIR).collect()
    }
    pref = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_prefix_jaccard_pairs(spark, SF_DIR).collect()
    }
    assert full == pref


def test_prefix_filter_prunes_planted_hot_shingle(spark):
    """Skew robustness: a shingle shared by every doc gives the full
    inverted index C(D,2) candidates, but sorts LAST in every doc's
    rarest-first order and falls outside the prefixes — the prefix
    tier generates (near) zero candidates and stays exact."""
    from tfm_semisup_spark.queries.dedup import (
        hashed_shingles,
        prefix_filter_candidates,
    )

    d = 40
    rows = [
        (
            i,
            " ".join(f"u{i}w{j}" for j in range(12)) + " common hot shingle",
        )
        for i in range(d)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    shingled = hashed_shingles(docs)
    full_candidates = (
        shingled.select("doc_id", F.explode("hs").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("vol"))
        .head()["vol"]
    )
    prefix_candidates = prefix_filter_candidates(shingled, 0.5).count()
    # hot 3-grams around the shared trailer give the full index >= C(40,2)
    assert full_candidates >= d * (d - 1) / 2
    assert prefix_candidates == 0


def test_pagerank_empty_edges_returns_empty_both_paths(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0
    assert pagerank(empty, small_graph_max_edges=0).count() == 0


def test_pagerank_directed_graph_same_results_both_paths(spark):
    # non-symmetric input: node universe and formula must not depend
    # on the strategy threshold (review regression: distributed path
    # derived nodes from src only)
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (1, 3)], "src long, dst long")
    fast = {r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()}
    dist = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=4, small_graph_max_edges=0).collect()
    }
    assert set(fast) == set(dist) == {1, 2, 3}
    for node in fast:
        assert math.isclose(fast[node], dist[node], rel_tol=1e-12), node


def test_boilerplate_keeps_wordless_documents(spark):
    docs = _mkdocs(
        spark,
        [(1, "alpha beta gamma"), (2, ""), (3, "   "), (4, "alpha beta gamma")],
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(docs, line_tokens=3, min_docs=2).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    for wordless in (2, 3):
        assert out[wordless]["n_segments"] == 0
        assert out[wordless]["n_boilerplate"] == 0
        assert out[wordless]["clean_text"] == ""
    assert out[1]["n_boilerplate"] == 1  # shared line across docs 1 and 4


def test_segment_word_lines_no_scan_side_filter(spark):
    """The empty-doc guard must live inside the projection, not a
    Filter that Catalyst pushes into the scan with the tokenize
    pipeline inlined (SCALE.md hashed_shingles lesson)."""
    from tfm_semisup_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents").repartition(4, "doc_id")
    plan = (
        segment_word_lines(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Filter (size(" not in plan

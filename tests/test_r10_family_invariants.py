"""Closed-form invariants of the r10 query families at sf0.001.

The oracle-parity sweep already pins Spark == DuckDB; these pin the
MATH against things no oracle can drift with — monotonicity, range,
conservation — so a same-on-both-sides formula bug (the class parity
cannot catch) still fails a test.
"""

from __future__ import annotations

import math

from tests.conftest import SF_DIR
from tfm_semisup_spark.queries import QUERIES, load_all_queries

load_all_queries()


def _rows(spark, name):
    return QUERIES[name](spark, SF_DIR).collect()


def test_k_anonymity_monotone_in_k(spark):
    rows = {r["k"]: r for r in _rows(spark, "k_anonymity_audit")}
    ks = sorted(rows)
    for lo, hi in zip(ks, ks[1:]):
        # raising k can only put MORE classes/rows below the bar
        assert rows[lo]["n_classes_below_k"] <= rows[hi]["n_classes_below_k"]
        assert rows[lo]["n_rows_below_k"] <= rows[hi]["n_rows_below_k"]
        assert rows[lo]["pct_rows_at_risk"] <= rows[hi]["pct_rows_at_risk"]
    for r in rows.values():
        assert 0.0 <= r["pct_rows_at_risk"] <= 100.0
        assert 0 <= r["min_l_diversity"] <= 3  # 3 sensitive classes


def test_lang_vocab_jaccard_bounds_and_pair_count(spark):
    rows = _rows(spark, "lang_vocab_jaccard")
    assert len(rows) == 10  # C(5 languages, 2)
    for r in rows:
        assert r["lang_a"] < r["lang_b"]
        assert 0 < r["n_shared"] <= min(r["vocab_a"], r["vocab_b"])
        expect = r["n_shared"] / (r["vocab_a"] + r["vocab_b"] - r["n_shared"])
        assert math.isclose(r["jaccard"], expect, abs_tol=1e-6)


def test_matryoshka_overlap_bounded_by_k(spark):
    rows = _rows(spark, "embedding_matryoshka_audit")
    assert {r["k"] for r in rows} == {1, 5, 10}
    for r in rows:
        assert 0 <= r["n_overlap"] <= r["k"]
        assert math.isclose(r["recall_at_k"], r["n_overlap"] / r["k"], abs_tol=1e-6)


def test_negative_sampling_weight_formula_and_mass(spark):
    rows = _rows(spark, "negative_sampling_table")
    assert rows
    total_sampled = sum(r["n_sampled"] for r in rows)
    assert 0 < total_sampled <= 1000  # top-15 subset of the 1000 draws
    for r in rows:
        n = min(r["corpus_count"], 100_000)
        assert r["weight"] == int(math.floor(math.sqrt(math.sqrt(float(n) * n * n))))


def test_nelson_aalen_hazard_monotone_and_consistent_with_km(spark):
    na = sorted(_rows(spark, "nelson_aalen_conversion"), key=lambda r: r["t_days"])
    assert na
    prev = 0.0
    for r in na:
        assert r["cum_hazard"] >= prev - 1e-9  # nondecreasing
        prev = r["cum_hazard"]
        assert 0.0 < r["fh_survival"] <= 1.0
        assert r["n_events"] <= r["n_risk"]
    km = {r["t_days"]: r for r in _rows(spark, "kaplan_meier_conversion")}
    # same risk grid: event times, risk sets and event counts agree
    assert {r["t_days"] for r in na} == set(km)
    for r in na:
        k = km[r["t_days"]]
        assert (r["n_risk"], r["n_events"]) == (k["n_risk"], k["n_events"])
        # S_KM <= S_FH pointwise (1-x <= exp(-x))
        assert k["survival"] <= r["fh_survival"] + 1e-6


def test_trigram_lift_consistency(spark):
    rows = _rows(spark, "event_path_trigrams")
    assert rows and len(rows) <= 20
    for r in rows:
        assert r["n"] > 0 and r["lift"] > 0.0


def test_hits_scores_positive_and_sorted(spark):
    rows = _rows(spark, "part_hits_authorities")
    assert 0 < len(rows) <= 10
    scores = [r["authority_score"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_attribution_time_decay_credit_conserves_conversions(spark):
    rows = _rows(spark, "attribution_time_decay")
    # each converting user's quantized fractions sum to ~1, so total
    # credit = #distinct users with >= 1 pre-purchase touch. That count
    # is bracketed by the per-type user counts: max (one type's users
    # all distinct) <= total <= sum (types share users)
    total_credit = sum(r["credit"] for r in rows)
    assert max(r["n_users"] for r in rows) - 1e-6 <= total_credit
    assert total_credit <= sum(r["n_users"] for r in rows) + 1e-6
    # and the per-user floor dust keeps it within 0.1% of an integer
    assert abs(total_credit - round(total_credit)) < 0.001 * max(
        1.0, total_credit
    )


def test_minhash_calibration_estimates_match_agreement_level(spark):
    rows = _rows(spark, "minhash_calibration_audit")
    assert rows
    for r in rows:
        # banded candidates span the full agreement range (a band
        # collision only pins 2 coordinates) — that coverage is the
        # audit's point, unlike the >=6 promotion tier
        assert 2 <= r["n_match"] <= 8
        assert math.isclose(r["avg_est_sim"], r["n_match"] / 8.0, abs_tol=1e-6)
        assert 0.0 <= r["avg_exact_jaccard"] <= 1.0
        assert r["mean_abs_err"] >= abs(r["avg_est_sim"] - r["avg_exact_jaccard"]) - 1e-6


def test_curriculum_manifest_conserves_corpus(spark):
    import duckdb

    rows = _rows(spark, "curriculum_training_manifest")
    n_docs = sum(r["n_docs"] for r in rows)
    chars = sum(r["chars_sum"] for r in rows)
    con = duckdb.connect()
    ref_n, ref_chars = con.execute(
        f"SELECT COUNT(*), SUM(n_chars) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()
    assert n_docs == ref_n and chars == ref_chars
    assert all(0 <= r["decile"] <= 9 for r in rows)
    assert all(0 <= r["shard"] <= 7 for r in rows)


def test_bh_fdr_discovery_set_is_prefix_of_p_ranking(spark):
    rows = sorted(
        _rows(spark, "bh_fdr_nation_conversion"),
        key=lambda r: (r["p_value"], r["nation"]),
    )
    flags = [r["bh_discovery"] for r in rows]
    # discoveries form a prefix of the p-ranked list
    if True in flags:
        last = max(i for i, f in enumerate(flags) if f)
        assert all(flags[: last + 1])
    for r in rows:
        assert 0.0 <= r["p_value"] <= 1.0 + 1e-9


def test_cochran_armitage_sign_matches_rate_trend(spark):
    row = _rows(spark, "cochran_armitage_trend")[0]
    assert 0 < row["n_returned"] < row["n_total"]
    # z and the integer numerator must agree in sign
    if row["t_num"] > 0:
        assert row["z_score"] > 0
    elif row["t_num"] < 0:
        assert row["z_score"] < 0
    else:
        assert row["z_score"] == 0.0


def test_mann_kendall_trend_label_matches_sign(spark):
    for r in _rows(spark, "mann_kendall_daily_trend"):
        if r["s_stat"] > 0:
            assert r["trend"] == "increasing" and r["z_score"] >= 0
        elif r["s_stat"] < 0:
            assert r["trend"] == "decreasing" and r["z_score"] <= 0
        else:
            assert r["trend"] == "no trend" and r["z_score"] == 0.0


def test_rake_phrases_within_length_band_and_positive_scores(spark):
    rows = _rows(spark, "keyword_rake_top")
    assert rows
    for r in rows:
        n_words = len(r["phrase"].split(" "))
        assert 2 <= n_words <= 4
        assert r["n_occ"] >= 1
        assert r["rake_score"] > 0.0


def test_feature_hashing_audit_counts_consistent(spark):
    row = _rows(spark, "feature_hashing_audit")[0]
    assert 0 < row["n_buckets_used"] <= 1024
    assert row["n_collided_words"] <= row["n_vocab"]
    assert row["max_vocab_per_bucket"] >= 1
    assert 0.0 <= row["pct_token_mass_collided"] <= 100.0

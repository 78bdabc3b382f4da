"""Round-11 continuation behavior pins: closed-form invariants the
oracle hash can't express (cross-row/cross-query consistency), one per
new family. Strict-codegen compilation for these entries is already
covered by test_plan_shapes_r11.py's added==11 sweep.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tfm_semisup_spark.queries import QUERIES, load_all_queries
from tfm_semisup_spark.queries.analytics import _cooc_pairs
from tfm_semisup_spark.queries.fusion import _CAND, _FUSED_TOP, _RRF_K
from tfm_semisup_spark.queries.graph4 import LP_MIN_USERS
from tfm_semisup_spark.queries.stats6 import _RMST_TAU

load_all_queries()


def test_link_prediction_returns_nonedges_with_consistent_scores(spark):
    rows = QUERIES["item_link_prediction_ra"](spark, SF_DIR).collect()
    assert rows, "candidate non-edges must exist"
    edges = {
        (r["item_a"], r["item_b"])
        for r in _cooc_pairs(spark, SF_DIR)
        .where(F.col("n_users") >= LP_MIN_USERS)
        .collect()
    }
    for r in rows:
        assert (r["item_a"], r["item_b"]) not in edges, "output must be a non-edge"
        assert r["item_a"] < r["item_b"]
        assert r["common_neighbors"] >= 1
        # each common neighbor contributes 1e9/deg <= 1e9/2 (deg >= 2
        # for any shared neighbor) and > 0
        assert 0 < r["ra_score_q"] <= r["common_neighbors"] * 500_000_000
        assert 0 < r["jaccard_q"] <= 1_000_000


def test_winnowing_pairs_detect_planted_duplicates(spark):
    rows = QUERIES["dedup_winnowing_pairs"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["shared_fps"] <= min(r["n_fp_a"], r["n_fp_b"])
        assert 0 < r["containment_q"] <= 1_000_000
    # the corpus plants exact duplicates: the top pair must be a full
    # containment match
    assert rows[0]["containment_q"] == 1_000_000


def test_rrf_fused_scores_recompute_from_ranks(spark):
    rows = QUERIES["retrieval_rrf_hybrid"](spark, SF_DIR).collect()
    assert rows
    per_query: dict[int, int] = {}
    for r in rows:
        per_query[r["query_id"]] = per_query.get(r["query_id"], 0) + 1
        for rank in (r["rank_dense"], r["rank_lex"]):
            assert 0 <= rank <= _CAND
        expect = sum(
            1_000_000_000 // (_RRF_K + rank)
            for rank in (r["rank_dense"], r["rank_lex"])
            if rank > 0
        )
        assert r["rrf_q"] == expect
        assert r["rank_dense"] > 0 or r["rank_lex"] > 0
    assert all(n <= _FUSED_TOP for n in per_query.values())


def test_rmst_bounded_by_horizon(spark):
    rows = QUERIES["rmst_conversion_ab"](spark, SF_DIR).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0.0 <= r["rmst_days"] <= _RMST_TAU
        assert 0 <= r["events_within_tau"] <= r["n_users"]


def test_mcnemar_counts_are_consistent(spark):
    (r,) = QUERIES["ssl_mcnemar_feature_ablation"](spark, SF_DIR).collect()
    assert r["disc_b"] <= r["n_correct_a"]
    assert r["disc_c"] <= r["n_correct_b"]
    assert r["n_agree"] <= r["n_pool"]
    # discordant pairs disagree, so they sit outside the agree set
    assert r["disc_b"] + r["disc_c"] <= r["n_pool"] - r["n_agree"]
    assert r["mcnemar_chi2"] >= 0.0
    # accuracy identity: correct_a - correct_b == b - c
    assert r["n_correct_a"] - r["n_correct_b"] == r["disc_b"] - r["disc_c"]


def test_lpa_communities_are_nonoverlapping_summaries(spark):
    rows = QUERIES["item_community_lpa"](spark, SF_DIR).collect()
    assert rows
    sizes = [r["n_members"] for r in rows]
    assert sizes == sorted(sizes, reverse=True), "ordered by size desc"
    for r in rows:
        assert r["n_members"] >= 1
        assert r["min_item"] <= r["max_item"]


def test_dsir_selects_only_nontarget_docs_deterministically(spark):
    fn = QUERIES["dsir_importance_select"]
    a = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    b = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    assert a == b, "deterministic"
    assert a
    for r in fn(spark, SF_DIR).collect():
        assert r["lang"] != "en"
        assert r["n_tokens"] > 0


def test_mixture_plan_shares_sum_to_one_and_balance_epochs(spark):
    rows = QUERIES["domain_mixture_plan"](spark, SF_DIR).collect()
    assert rows
    total_share = sum(r["share_ppm"] for r in rows)
    # floor-division shares: within n_sources ppm below 1.0
    assert 1_000_000 - len(rows) <= total_share <= 1_000_000
    n = {r["source"]: r["n_tokens"] for r in rows}
    e = {r["source"]: r["epochs_ppm"] for r in rows}
    small = min(n, key=n.get)
    big = max(n, key=n.get)
    if n[small] < n[big]:
        # temperature < 1 upsamples small domains
        assert e[small] >= e[big]


def test_two_round_tritrain_exercises_the_refit(spark):
    rows = QUERIES["ssl_tritrain_two_round_nb"](spark, SF_DIR).collect()
    by_round: dict[int, dict] = {1: {}, 2: {}}
    for r in rows:
        by_round[r["rnd"]][(r["target_view"], r["pred_class"])] = (
            r["n_promoted"],
            r["promoted_key_sum"],
        )
    assert by_round[1] and by_round[2], "both rounds must emit summaries"
    # the refit on pseudo-labels must move at least one view's
    # agreement set (identical rounds would mean the refit is dead code)
    assert by_round[1] != by_round[2]
    for rnd in (1, 2):
        for (view, _), (n, ksum) in by_round[rnd].items():
            assert n >= 1 and ksum >= n


def test_competing_risks_aalen_johansen_identity(spark):
    rows = sorted(
        QUERIES["competing_risks_incidence"](spark, SF_DIR).collect(),
        key=lambda r: r["t_days"],
    )
    assert rows
    prev1 = prev2 = 0.0
    for r in rows:
        # CIFs are nondecreasing and the AJ identity holds at every
        # event time: CIF_1 + CIF_2 + S_all-cause == 1
        assert r["cif_purchase"] >= prev1 - 1e-9
        assert r["cif_signup"] >= prev2 - 1e-9
        prev1, prev2 = r["cif_purchase"], r["cif_signup"]
        total = r["cif_purchase"] + r["cif_signup"] + r["survival_all_cause"]
        assert abs(total - 1.0) < 1e-4, r


def test_dedup_cascade_stages_reconcile(spark):
    rows = {r["stage"]: r for r in
            QUERIES["dedup_cascade_report"](spark, SF_DIR).collect()}
    assert set(rows) == {"1_exact", "2_winnow_candidates",
                         "3_jaccard_verified"}
    e, c, v = (rows["1_exact"], rows["2_winnow_candidates"],
               rows["3_jaccard_verified"])
    # tier outputs feed tier inputs
    assert e["n_out"] == e["n_in"] - e["n_dropped"]
    assert c["n_in"] == e["n_out"] and c["n_dropped"] == 0
    assert v["n_in"] == c["n_out"]
    assert v["n_out"] == v["n_in"] - v["n_dropped"]
    # verification can only shrink the candidate set, and each verified
    # pair drops at most one doc (shared docs collapse the distinct set)
    assert v["n_pairs"] <= c["n_pairs"]
    assert v["n_dropped"] <= v["n_pairs"]
    # the corpus plants near-duplicates: the verify tier must fire
    assert v["n_dropped"] >= 1


def test_kappa_and_mcnemar_share_the_decided_table(spark):
    (k,) = QUERIES["ssl_kappa_agreement"](spark, SF_DIR).collect()
    (m,) = QUERIES["ssl_mcnemar_feature_ablation"](spark, SF_DIR).collect()
    # both derive from the identical two-model decided table
    assert k["n_pool"] == m["n_pool"]
    assert k["n_agree"] == m["n_agree"]
    # kappa is bounded by the raw agreement rate and by 1
    assert k["kappa"] <= k["n_agree"] / k["n_pool"] + 1e-9
    assert -1.0 <= k["kappa"] <= 1.0

"""Named query registry.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` registered
under a stable name; SQL-expressible queries also register an ANSI-SQL
oracle string that DuckDB runs over the same parquet tables
(driver contract in ``__spark_entry__.py``).

Output conventions (required for the driver's order-insensitive
value-hash compare):
- every computed column is explicitly aliased, identically in both the
  DataFrame code and the oracle SQL;
- floating-point aggregates are ``round``-ed (2-6 dp) on BOTH sides so
  engine-level summation-order ULP differences can't flip the hash;
- integer-valued derived columns are cast to BIGINT on both sides
  (Spark month() is int32, DuckDB sum(int) is HUGEINT, ...);
- timestamps in outputs are formatted as strings to dodge
  datetime64[ns]-vs-[us] dtype differences.
"""

from __future__ import annotations

import glob as _glob
import json as _json
import os as _os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Oracled entries whose EMPTY result at specific gate SFs is a
#: reviewed decision, not an oversight (VERDICT r12 #5: a 0==0
#: hash-match is vacuous — every name here needs a justification, a
#: non-vacuous sibling exercising the same logic, AND the explicit set
#: of SF directory names where emptiness is legitimate; at any OTHER
#: SF the guard stays live, so a regression that empties the result
#: where it should have rows is still caught). Enforced by
#: tests/test_oracle_parity.py::test_no_oracled_query_is_vacuous and
#: scripts/driver_sim.py's empty-result guard via
#: ``vacuous_ok(name, sf_dir)``.
VACUOUS_OK: dict[str, dict] = {
    # Every synthetic customer has at least one order at every SF, so
    # the plain NOT-EXISTS result is legitimately empty; the anti-join
    # MEMBERSHIP logic is exercised non-vacuously by the r12 sibling
    # anti_join_no_urgent_customers (5 rows at sf0.01).
    "anti_join_orderless_customers": {
        "sibling": "anti_join_no_urgent_customers",
        "empty_ok_at": {"sf0.001", "sf0.01", "sf0.1", "sf1", "sf2"},
    },
    # (r14: dedup_exact_keepers left this list — it now selects
    # keepers over the PLANTED corpus, firing at every SF.)
    # The CLASSIC Q11 fraction-of-total cutoff decays with SF by
    # construction (part count grows while each part's share shrinks):
    # NONZERO at sf0.001 (the guard stays live there — r13 review),
    # legitimately empty from sf0.01 up. Kept for the textbook
    # scalar-subquery-HAVING semantics; nonzero membership at every SF
    # is exercised by the r12 sibling q11_top_value_parts (1.5x-mean
    # cutoff, 290 rows at sf0.01).
    "q11_important_stock": {
        "sibling": "q11_top_value_parts",
        "empty_ok_at": {"sf0.01", "sf0.1", "sf1", "sf2"},
    },
    # The one-round co-training promotion cut (_CT2T_THR = 0.37) is a
    # measured proper non-empty subset per view at BOTH gate SFs
    # (959+983/1185 at sf0.001, 4771+3982/11953 at sf0.01) but the NB
    # posteriors flatten with SF and 0.37 promotes zero from sf0.1 up
    # — no single constant is proper at all three SFs (0.35, the
    # largest cut nonzero at sf0.1, floods sf0.001; see the oracle
    # comment in ssl_queries.py). The same trade's fixed-shape
    # siblings stay non-vacuous at sf0.1 (ssl_cotrain_two_round_
    # threshold emits zero-count rows; ssl_stump_one_round_threshold
    # keeps its two leaf rows).
    "ssl_cotrain_one_round_nb": {
        "sibling": "ssl_cotrain_two_round_threshold",
        "empty_ok_at": {"sf0.1", "sf1", "sf2"},
    },
    # Apriori level-3: the part catalog grows with SF while basket
    # width stays ~13, so repeated 3-sets vanish — measured max triple
    # support 3/2/1 at sf0.001/0.01/0.1 (r14 full-sf0.1 sweep audit):
    # no support cut >= 2 can fire at sf0.1 and support 1 is not an
    # association. The level-2 pass (basket_part_lift) stays
    # non-vacuous at every SF and exercises the identical
    # fan-out-bounded co-order join + support/lift algebra.
    "basket_part_triples": {
        "sibling": "basket_part_lift",
        "empty_ok_at": {"sf0.1", "sf1", "sf2"},
    },
    # The co-engagement item graph saturates to COMPLETE as users grow
    # over the fixed ~100-item catalog: measured (edges, non-edges) at
    # LP_MIN_USERS thresholds 2..8 — sf0.001 needs thr <= 3 for any
    # edges at all, sf0.1 has 4950/4950 possible edges present for
    # every thr <= 5 (zero non-edges to predict). The feasible
    # constants at the two SFs are DISJOINT, so sf0.1-emptiness is
    # intrinsic to link prediction on a saturated graph, not a dead
    # filter. The wedge-join machinery stays non-vacuous at sf0.1 via
    # item_triangle_counts (same _EDGE_CTES, 100 rows at every SF).
    "item_link_prediction_ra": {
        "sibling": "item_triangle_counts",
        "empty_ok_at": {"sf0.1", "sf1", "sf2"},
    },
}


def vacuous_ok(name: str, sf_dir: str) -> bool:
    """True iff an empty result for ``name`` at ``sf_dir`` is a
    reviewed, allowlisted outcome (matched on the directory basename,
    e.g. '/root/testdata/sf0.01' -> 'sf0.01')."""
    entry = VACUOUS_OK.get(name)
    if entry is None:
        return False
    return _os.path.basename(_os.path.normpath(sf_dir)) in entry["empty_ok_at"]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Driver-verification window: the correctness driver evaluates the
# FIRST ``DRIVER_WINDOW`` oracled entries of ``queries()`` in dict
# order.
#
# ROUND-10 MECHANISM (VERDICT r9 #1/#2): the rotation is COMPUTED, not
# hand-pasted. Rounds 7 and 9 both proved that a static list goes red
# the moment the driver\'s own CORRECTNESS_r{N}.json artifact lands
# (the round counter advances but the list still holds the previous
# window). The window is now derived, deterministically, from the
# checked-in artifacts themselves:
#
#   deadline(oracle) = added_round + GRACE_ROUNDS        (never checked)
#                    = newest_driver_row + STALENESS_ROUNDS (checked)
#
# and the priority order is earliest-deadline-first (name tiebreak).
# The first DRIVER_WINDOW entries are the window. EDF is optimal for
# this scheduling problem: if any schedule satisfies every deadline,
# the EDF schedule does — and because each round\'s fill refreshes the
# soonest-deadline cohort ahead of time, lumped 50-entry cohorts (the
# r9 zero-slack crunch) smear out instead of all falling due at once.
#
# Feasibility math for STALENESS_ROUNDS = 7 (VERDICT r9 #2): capacity
# is DRIVER_WINDOW per round = 350 slots per 7-round cycle vs demand
# of ~250 live oracles + new births; average slack ~= 50 - 250/7 ~= 14
# births/round sustained. The previous bound of 6 left mathematically
# zero slack at r11/r13/r14/r15 (250 oracles in 50-entry cohorts / 50
# slots is an exact 5-round cycle) — one windowing mistake away from
# unsatisfiable. scripts/propose_rotation.py prints this order and a
# 6-round lookahead; tests/test_window_rotation.py pins feasibility
# WITH slack.

DRIVER_WINDOW = 50
#: rounds an oracle may stay never-driver-checked (1 = its birth round)
GRACE_ROUNDS = 2
#: rounds after which a checked oracle must be re-windowed
STALENESS_ROUNDS = 7

_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def driver_facts(repo: str | None = None) -> tuple[int, dict[str, int], dict[str, int]]:
    """Read the driver\'s own artifacts: returns ``(current_round,
    newest_row, birth_round)`` where ``newest_row`` maps oracle name ->
    newest round with a CORRECTNESS row and ``birth_round`` maps name
    -> the round it was registered (driver_history.json). Depends only
    on checked-in files, so the computed window is identical for the
    test suite, the bench, and the driver within a round — and advances
    automatically when the next CORRECTNESS artifact lands."""
    repo = repo or _REPO_ROOT
    newest: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(_glob.glob(_os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(_os.path.basename(path).split("_r")[1].split(".")[0])
        rounds.append(rnd)
        try:
            with open(path) as fh:
                names = _json.load(fh)
        except (OSError, ValueError):
            continue
        for n in names:
            newest[n] = max(newest.get(n, 0), rnd)
    current = (max(rounds) if rounds else 0) + 1
    birth: dict[str, int] = {}
    try:
        with open(_os.path.join(repo, "driver_history.json")) as fh:
            birth = {n: v.get("added", current) for n, v in _json.load(fh).items()}
    except (OSError, ValueError):
        pass
    return current, newest, birth


def rotation_order(
    names: list[str],
    newest: dict[str, int],
    birth: dict[str, int],
    current_round: int,
) -> list[str]:
    """Earliest-deadline-first ordering of ``names``. Pure function of
    its inputs so scripts/propose_rotation.py can simulate future
    rounds with hypothetical ``newest`` maps.

    Tie-break within a deadline (r13 refinement): NEVER-driver-checked
    entries sort before staleness re-confirmations — a never-checked
    oracle has zero lifetime driver evidence (judge-replicated only),
    while a stale one has already proven itself; when a deadline cohort
    overflows the window, the re-confirmation is the safer entry to
    defer one round (r12 close: ``text_tfidf_portable_norms`` landed at
    position 51 behind same-deadline re-checks under the plain name
    tiebreak). Name remains the final tiebreak for determinism."""

    def deadline(n: str) -> int:
        if n in newest:
            return newest[n] + STALENESS_ROUNDS
        return birth.get(n, current_round) + GRACE_ROUNDS

    return sorted(names, key=lambda n: (deadline(n), n in newest, n))


#: full EDF ordering of every oracled entry — rebuilt by
#: ``_reorder_registries()`` on each ``load_all_queries()`` call.
_ORACLE_PRIORITY: list[str] = []


def _reorder_registries() -> None:
    """Recompute the EDF rotation from the driver artifacts and rebuild
    QUERIES/ORACLES in that order, in place (both dicts are imported by
    reference elsewhere). Oracled entries lead in EDF order — the first
    DRIVER_WINDOW of them are this round\'s driver window — followed by
    rows-only entries in registration order."""
    current, newest, birth = driver_facts()
    _ORACLE_PRIORITY[:] = rotation_order(list(ORACLES), newest, birth, current)
    for registry in (QUERIES, ORACLES):
        ordered = {n: registry[n] for n in _ORACLE_PRIORITY if n in registry}
        ordered.update((n, v) for n, v in registry.items() if n not in ordered)
        registry.clear()
        registry.update(ordered)


def load_all_queries() -> None:
    """Import every query module so registration side effects run, then
    apply the driver-window priority order."""
    from tfm_semisup_spark.queries import relational  # noqa: F401
    from tfm_semisup_spark.queries import relational2  # noqa: F401
    from tfm_semisup_spark.queries import relational3  # noqa: F401
    from tfm_semisup_spark.queries import relational4  # noqa: F401
    from tfm_semisup_spark.queries import relational5  # noqa: F401
    from tfm_semisup_spark.queries import relational6  # noqa: F401
    from tfm_semisup_spark.queries import relational7  # noqa: F401
    from tfm_semisup_spark.queries import tpch_shapes  # noqa: F401
    from tfm_semisup_spark.queries import tpch_shapes2  # noqa: F401
    from tfm_semisup_spark.queries import tpch_shapes3  # noqa: F401
    from tfm_semisup_spark.queries import dedup  # noqa: F401
    from tfm_semisup_spark.queries import similarity  # noqa: F401
    from tfm_semisup_spark.queries import text_analysis  # noqa: F401
    from tfm_semisup_spark.queries import windows  # noqa: F401
    from tfm_semisup_spark.queries import multimodal  # noqa: F401
    from tfm_semisup_spark.queries import ssl_queries  # noqa: F401
    from tfm_semisup_spark.queries import corpus_prep  # noqa: F401
    from tfm_semisup_spark.queries import pii  # noqa: F401
    from tfm_semisup_spark.queries import contamination  # noqa: F401
    from tfm_semisup_spark.queries import sketches  # noqa: F401
    from tfm_semisup_spark.queries import retrieval  # noqa: F401
    from tfm_semisup_spark.queries import analytics  # noqa: F401
    from tfm_semisup_spark.queries import boilerplate  # noqa: F401
    from tfm_semisup_spark.queries import expectations  # noqa: F401
    from tfm_semisup_spark.queries import stats2  # noqa: F401
    from tfm_semisup_spark.queries import text_analysis2  # noqa: F401
    from tfm_semisup_spark.queries import graph2  # noqa: F401
    from tfm_semisup_spark.queries import analytics2  # noqa: F401
    from tfm_semisup_spark.queries import graph3  # noqa: F401
    from tfm_semisup_spark.queries import stats3  # noqa: F401
    from tfm_semisup_spark.queries import text_analysis3  # noqa: F401
    from tfm_semisup_spark.queries import spatial  # noqa: F401
    from tfm_semisup_spark.queries import stats4  # noqa: F401
    from tfm_semisup_spark.queries import stats5  # noqa: F401
    from tfm_semisup_spark.queries import stats6  # noqa: F401
    from tfm_semisup_spark.queries import graph4  # noqa: F401
    from tfm_semisup_spark.queries import winnowing  # noqa: F401
    from tfm_semisup_spark.queries import data_selection  # noqa: F401
    from tfm_semisup_spark.queries import fusion  # noqa: F401
    from tfm_semisup_spark.queries import text_analysis4  # noqa: F401
    from tfm_semisup_spark.queries import stats7  # noqa: F401
    from tfm_semisup_spark.queries import dedup_cascade  # noqa: F401
    from tfm_semisup_spark.queries import spc  # noqa: F401
    from tfm_semisup_spark.queries import analytics3  # noqa: F401
    from tfm_semisup_spark.queries import linkage  # noqa: F401

    _reorder_registries()

"""Round-14 plan and behavior pins.

- ssl_cotrain_one_round_nb's promotion cut is genuinely SELECTIVE
  (ADVICE r13 medium): the r13 "above-uniform-prior" predicate
  3*t_max > t_sum promoted the whole pool at every gate SF, so the
  threshold branch was dead code.  The r14 fix reuses the measured
  _CT2T_THR quantized cut; this file pins 0 < n_promoted < pool per
  view so a future promote-everything regression fails loudly;
- every r14-born query compiles under strict codegen (same governance
  auto-sweep as r13, keyed on driver_history birth rounds).
"""

from __future__ import annotations

import json
import os

import pytest

from tests.conftest import SF_DIR, SF_DIR_01
from tfm_semisup_spark.queries import QUERIES, load_all_queries

load_all_queries()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _r14_new_queries() -> list[str]:
    with open(os.path.join(_REPO, "driver_history.json")) as fh:
        hist = json.load(fh)
    return sorted(
        n for n, v in hist.items() if v.get("added") == 14 and n in QUERIES
    )


@pytest.fixture()
def strict_codegen(spark):
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark
    spark.conf.set("spark.sql.codegen.fallback", "true")


@pytest.mark.parametrize("name", _r14_new_queries())
def test_r14_queries_compile_under_strict_codegen(strict_codegen, name):
    assert QUERIES[name](strict_codegen, SF_DIR).count() >= 0


@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_01])
def test_cotrain_one_round_promotion_is_proper_subset(spark, sf):
    """The one-round co-training promotion must be a NONZERO, PROPER
    subset of the unlabeled pool for both views at both gate SFs —
    the exact property whose absence ADVICE r13 flagged (measured at
    the 0.37 cut: 959+983/1185 at sf0.001, 4771+3982/11953 at
    sf0.01, agreement 253/778)."""
    from tfm_semisup_spark.queries.ssl_queries import _nb1_base

    _, unlabeled = _nb1_base(spark, sf)
    pool = unlabeled.count()
    rows = QUERIES["ssl_cotrain_one_round_nb"](spark, sf).collect()
    per_view: dict[str, int] = {}
    for r in rows:
        per_view[r["view_name"]] = (
            per_view.get(r["view_name"], 0) + r["n_promoted"]
        )
    for view in ("priority", "month"):
        assert 0 < per_view.get(view, 0) < pool, (
            f"{view} promoted {per_view.get(view, 0)} of {pool} at {sf} — "
            "the threshold filter must do selective work"
        )
    # the agreement join must also carry real rows
    assert 0 < per_view.get("agreement", 0) < pool
    # and agreement is necessarily no larger than either view's set
    assert per_view["agreement"] <= min(
        per_view["priority"], per_view["month"]
    )

"""Driver-window rotation governance (VERDICT r7 #5).

Round 7 proved a comment is not a mechanism: the registry promised the
23 never-windowed r6 oracles would lead the r7 window, the list was
never reordered, and the driver re-checked the same 50 queries twice.
These tests make the rotation discipline executable:

- every oracled entry must have its birth round recorded in
  ``driver_history.json`` (new entries fail until recorded);
- no oracled entry may go >=2 rounds with NO driver CORRECTNESS row
  unless it sits inside the CURRENT 50-slot window (i.e. it will get
  its row this round). Reverting an r8-style rotation turns this red.

The driver facts themselves are recomputed from the checked-in
CORRECTNESS_r*.json files — nothing here can drift from what the
driver actually verified.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the correctness driver evaluates the first N oracled entries
DRIVER_WINDOW = 50
#: an oracled entry may stay un-driver-checked for this many rounds
#: (1 = the round it was added) before it MUST be in the window
MAX_ROUNDS_NEVER_CHECKED = 2


def _driver_rounds() -> dict[str, list[int]]:
    seen: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as fh:
            for name in json.load(fh):
                seen.setdefault(name, []).append(rnd)
    return seen


def _current_round() -> int:
    rounds = [r for v in _driver_rounds().values() for r in v]
    return (max(rounds) if rounds else 0) + 1


def _history() -> dict[str, dict]:
    with open(os.path.join(REPO, "driver_history.json")) as fh:
        return json.load(fh)


def test_every_oracle_has_recorded_birth_round():
    from tfm_semisup_spark.queries import ORACLES, load_all_queries

    load_all_queries()
    hist = _history()
    unrecorded = sorted(set(ORACLES) - set(hist))
    assert not unrecorded, (
        f"new oracled entries must record their birth round in "
        f"driver_history.json: {unrecorded}"
    )


def test_no_oracle_unchecked_beyond_grace_and_outside_window():
    """An oracled entry with no CORRECTNESS row in any round, older
    than the grace period, must be inside the current driver window so
    it gets its row THIS round — the exact failure mode of r7."""
    from tfm_semisup_spark.queries import ORACLES, load_all_queries

    load_all_queries()
    window = set(list(ORACLES)[:DRIVER_WINDOW])
    checked = _driver_rounds()
    hist = _history()
    current = _current_round()
    overdue = sorted(
        name
        for name in ORACLES
        if name not in checked
        and name not in window
        and current - hist.get(name, {}).get("added", current)
        >= MAX_ROUNDS_NEVER_CHECKED
    )
    assert not overdue, (
        f"oracled entries never driver-checked, past the "
        f"{MAX_ROUNDS_NEVER_CHECKED}-round grace, and NOT in the "
        f"current {DRIVER_WINDOW}-slot window — reorder "
        f"_ORACLE_PRIORITY (queries/__init__.py): {overdue}"
    )


def test_window_is_full_width():
    """The registry has >50 oracles; a shrunken window wastes driver
    verification slots."""
    from tfm_semisup_spark.queries import ORACLES, load_all_queries

    load_all_queries()
    assert len(ORACLES) >= DRIVER_WINDOW


#: once driver-checked, an oracle must be RE-windowed within this many
#: rounds (VERDICT r8 #4 — plan-changed queries keep getting
#: re-confirmed; the never-checked grace above only forces a FIRST row)
MAX_STALENESS_ROUNDS = 6


def test_no_oracle_staler_than_bound_and_outside_window():
    """An oracle whose NEWEST driver CORRECTNESS row is >= 6 rounds old
    must be inside the current window so it gets re-confirmed this
    round. With ~220 oracles and 50 slots/round, a 6-round cycle gives
    300 slots — the bound is satisfiable with headroom, and it turns
    'we hand-prioritize plan-changed queries' (r8 practice) into an
    executable policy."""
    from tfm_semisup_spark.queries import ORACLES, load_all_queries

    load_all_queries()
    window = set(list(ORACLES)[:DRIVER_WINDOW])
    checked = _driver_rounds()
    current = _current_round()
    stale = sorted(
        name
        for name in ORACLES
        if name in checked
        and name not in window
        and current - max(checked[name]) >= MAX_STALENESS_ROUNDS
    )
    assert not stale, (
        f"oracled entries whose newest driver row is >= "
        f"{MAX_STALENESS_ROUNDS} rounds old and NOT in the current "
        f"{DRIVER_WINDOW}-slot window — rotate them into "
        f"_ORACLE_PRIORITY (queries/__init__.py): {stale}"
    )


def test_rotation_proposal_satisfies_governance():
    """scripts/propose_rotation.py must emit a window that would keep
    both governance tests green at the NEXT round (mandatory sets
    inside the window, full width)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from propose_rotation import GRACE, STALE, WINDOW, propose
    finally:
        sys.path.pop(0)

    window, notes = propose()
    assert not any("INFEASIBLE" in n for n in notes), notes
    assert len(window) == WINDOW == DRIVER_WINDOW
    assert len(set(window)) == WINDOW

    from tfm_semisup_spark.queries import ORACLES, load_all_queries

    load_all_queries()
    names = list(ORACLES)
    hist = _history()
    checked = _driver_rounds()
    last = {n: max(r) for n, r in checked.items()}
    this_round = _current_round()
    for n in names[:WINDOW]:  # driver runs the CURRENT window first
        last[n] = this_round
    nxt = this_round + 1
    wset = set(window)
    for n in names:
        if n not in last and nxt - hist.get(n, {}).get("added", nxt) >= GRACE:
            assert n in wset, f"never-checked-past-grace outside window: {n}"
        if n in last and nxt - last[n] >= STALE:
            assert n in wset, f"staleness-bound entry outside window: {n}"


def test_rotation_lookahead_feasible_six_rounds():
    """The 6-round window simulation must stay feasible (mandatory set
    never exceeds the 50 slots) — an oracle born into an impossible
    grace deadline would surface here as INFEASIBLE before it becomes
    a red governance test two rounds later."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from propose_rotation import lookahead
    finally:
        sys.path.pop(0)

    report = lookahead(6)
    assert len(report) == 6, report
    assert not any("INFEASIBLE" in line for line in report), report

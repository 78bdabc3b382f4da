"""Driver-window rotation governance (VERDICT r7 #5, r9 #1/#2).

Round 7 proved a comment is not a mechanism: the registry promised the
23 never-windowed r6 oracles would lead the r7 window, the list was
never reordered, and the driver re-checked the same 50 queries twice.
Round 9 proved a hand-pasted list is not one either: the suite was
green at close, then the driver's own CORRECTNESS_r09.json advanced
the round counter and three governance tests went red on arrival.

Since round 10 the rotation is COMPUTED: ``queries/__init__.py``
orders oracles earliest-deadline-first from the checked-in driver
artifacts, so the window advances automatically when a new artifact
lands. These tests pin (a) the governance invariants still hold on the
computed window, (b) the EDF computation itself, and (c) 6-round
forward feasibility WITH slack (VERDICT r9 #2).

The driver facts are recomputed from the checked-in
CORRECTNESS_r*.json files — nothing here can drift from what the
driver actually verified.
"""

from __future__ import annotations

import glob
import json
import os

from tfm_semisup_spark.queries import (
    DRIVER_WINDOW,
    GRACE_ROUNDS,
    STALENESS_ROUNDS,
    rotation_order,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: an oracled entry may stay un-driver-checked for this many rounds
#: (1 = the round it was added) before it MUST be in the window
MAX_ROUNDS_NEVER_CHECKED = GRACE_ROUNDS
#: once driver-checked, an oracle must be RE-windowed within this many
#: rounds. 7 (raised from 6 in r10 per VERDICT r9 #2): 250 oracles in
#: 50-entry birth cohorts against 50 slots/round made the 6-round bound
#: an exact zero-slack 5-round cycle; 7 gives 350 slots per cycle vs
#: ~250+births demand — ~14 slots/round of average slack.
MAX_STALENESS_ROUNDS = STALENESS_ROUNDS


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
        f"current {DRIVER_WINDOW}-slot window: {overdue}"
    )


def test_window_is_full_width():
    """The registry has >50 oracles; a shrunken window wastes driver
    verification slots."""
    from tfm_semisup_spark.queries import ORACLES, load_all_queries

    load_all_queries()
    assert len(ORACLES) >= DRIVER_WINDOW


def test_no_oracle_staler_than_bound_and_outside_window():
    """An oracle whose NEWEST driver CORRECTNESS row is >=
    MAX_STALENESS_ROUNDS rounds old must be inside the current window
    so it gets re-confirmed this round — plan-changed queries keep
    getting re-verified by the driver, not just the local suite."""
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
        f"{DRIVER_WINDOW}-slot window: {stale}"
    )


def test_edf_rotation_computation():
    """Unit-pin the EDF ordering: never-checked entries deadline at
    birth+grace, checked entries at newest_row+staleness, earliest
    first; within a deadline never-checked entries precede re-checks
    (r13 refinement — zero lifetime evidence beats a staleness
    re-confirmation when a cohort overflows), name last — and the
    window auto-advances when the facts change (the r9 red-on-arrival
    failure, now structural)."""
    names = ["a_old", "b_new", "c_fresh", "d_unborn"]
    newest = {"a_old": 4, "c_fresh": 9}
    birth = {"a_old": 1, "b_new": 9, "c_fresh": 8, "d_unborn": 10}
    # deadlines at r10: a_old 4+7=11, b_new 9+2=11, c_fresh 16,
    # d_unborn 12 -> EDF: b_new (never-checked wins the dl-11 tie),
    # a_old, d_unborn, c_fresh
    order = rotation_order(names, newest, birth, 10)
    assert order == ["b_new", "a_old", "d_unborn", "c_fresh"]
    # a_old gets its row at r10 -> its deadline jumps to 17; the next
    # round's order advances WITHOUT any list surgery
    newest2 = dict(newest, a_old=10, b_new=10)
    order2 = rotation_order(names, newest2, birth, 11)
    assert order2 == ["d_unborn", "c_fresh", "a_old", "b_new"]


def test_window_covers_current_mandatory_set():
    """By EDF construction the computed window must contain every
    entry that is due NOW (grace- or staleness-bound) whenever that
    due set fits in the window at all."""
    from tfm_semisup_spark.queries import ORACLES, load_all_queries

    load_all_queries()
    names = list(ORACLES)
    window = set(names[:DRIVER_WINDOW])
    checked = {n: max(r) for n, r in _driver_rounds().items()}
    hist = _history()
    current = _current_round()
    due = [
        n
        for n in names
        if (n in checked and current - checked[n] >= MAX_STALENESS_ROUNDS)
        or (
            n not in checked
            and current - hist.get(n, {}).get("added", current)
            >= MAX_ROUNDS_NEVER_CHECKED
        )
    ]
    assert len(due) <= DRIVER_WINDOW, (
        f"due-now set exceeds the window — the schedule is infeasible: "
        f"{len(due)} entries"
    )
    missing = sorted(set(due) - window)
    assert not missing, f"due-now entries outside the computed window: {missing}"


def test_rotation_proposal_satisfies_governance():
    """scripts/propose_rotation.py must project a next-round window
    that keeps both governance tests green at the NEXT round (due
    entries inside the window, full width)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from propose_rotation import propose
    finally:
        sys.path.pop(0)

    window, notes = propose()
    assert not any("INFEASIBLE" in n for n in notes), notes
    assert len(window) == DRIVER_WINDOW
    assert len(set(window)) == DRIVER_WINDOW

    from tfm_semisup_spark.queries import ORACLES, load_all_queries

    load_all_queries()
    names = list(ORACLES)
    hist = _history()
    checked = _driver_rounds()
    last = {n: max(r) for n, r in checked.items()}
    this_round = _current_round()
    for n in names[:DRIVER_WINDOW]:  # driver runs the CURRENT window first
        last[n] = this_round
    nxt = this_round + 1
    wset = set(window)
    for n in names:
        if (
            n not in last
            and nxt - hist.get(n, {}).get("added", nxt) >= MAX_ROUNDS_NEVER_CHECKED
        ):
            assert n in wset, f"never-checked-past-grace outside window: {n}"
        if n in last and nxt - last[n] >= MAX_STALENESS_ROUNDS:
            assert n in wset, f"staleness-bound entry outside window: {n}"


def test_rotation_lookahead_feasible_six_rounds_with_slack():
    """The 6-round window simulation must stay feasible with at least
    5 slots of slack every round (VERDICT r9 #2) — an oracle born into
    an impossible deadline, or cohort lumping eating the schedule's
    headroom, surfaces here before it becomes a red governance test."""
    import re
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from propose_rotation import lookahead
    finally:
        sys.path.pop(0)

    report = lookahead(6)
    assert len(report) == 6, report
    assert not any("INFEASIBLE" in line for line in report), report
    for line in report:
        slack = int(re.search(r"slack (\d+)", line).group(1))
        assert slack >= 5, f"lookahead slack below 5: {report}"


def test_growth_projection_catches_saturation_early():
    """VERDICT r13 #7: the growth-aware projection must (a) reduce to
    the static lookahead at growth 0, (b) report a below-SLACK_MIN
    breach when the simulated registration rate would outgrow the
    fixed 50-slot window within the horizon, and (c) measure the
    recent per-round registration rate from the birth records."""
    import re
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from propose_rotation import SLACK_MIN, growth_rate, projected_lookahead
    finally:
        sys.path.pop(0)

    # (a) growth 0 == static registry: same slacks as lookahead(), no
    # breach (the static test above already pins slack >= 5)
    lines, breached = projected_lookahead(6, growth=0.0)
    assert not breached, lines
    slacks = [
        int(re.search(r"slack (-?\d+)", line).group(1)) for line in lines[1:]
    ]
    assert all(s >= SLACK_MIN for s in slacks), lines

    # (b) an aggressive rate must trip the early warning inside the
    # horizon (capacity = 50 slots x 7-round staleness = 350; +40 per
    # round saturates from any current registry size within 6 rounds)
    lines, breached = projected_lookahead(6, growth=40.0)
    assert breached, lines

    # (c) rate = mean births over the last 3 COMPLETED rounds
    birth = {f"a{i}": 12 for i in range(4)} | {f"b{i}": 13 for i in range(2)}
    assert growth_rate(birth, current=14, span=3) == (4 + 2 + 0) / 3

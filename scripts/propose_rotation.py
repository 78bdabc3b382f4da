"""Inspect the computed driver-window rotation and its feasibility.

The correctness driver checks the FIRST 50 oracled entries of
``queries()``; tests/test_window_rotation.py enforces (a) a 2-round
never-checked grace and (b) a 7-round re-window staleness bound. Since
round 10 the rotation is COMPUTED, not hand-maintained: the registry
itself orders oracles earliest-deadline-first from the checked-in
driver artifacts (``tfm_semisup_spark/queries/__init__.py::
rotation_order``), so the window advances automatically the moment a
new CORRECTNESS_r{N}.json lands — the exact "green at close, red on
arrival" failure of rounds 7 and 9 can no longer occur. This script is
the inspection tool: it prints the current window, the next round's
projected window, and a 6-round feasibility lookahead.

Usage: PYTHONPATH=. python scripts/propose_rotation.py
Exit 1 if any simulated round's due-now set exceeds the 50 slots.
"""

from __future__ import annotations

import sys


def _facts():
    from tfm_semisup_spark.queries import (
        ORACLES,
        driver_facts,
        load_all_queries,
    )

    load_all_queries()
    return list(ORACLES), *driver_facts()


def propose() -> tuple[list[str], list[str]]:
    """Returns (projected window for the NEXT round, notes). Simulates
    the current computed window receiving its rows this round — which
    it always covers the mandatory set for, by EDF construction — then
    recomputes the EDF order for the following round."""
    from tfm_semisup_spark.queries import (
        DRIVER_WINDOW,
        GRACE_ROUNDS,
        STALENESS_ROUNDS,
        rotation_order,
    )

    names, current, newest, birth = _facts()
    cur_window = rotation_order(names, newest, birth, current)[:DRIVER_WINDOW]
    sim = dict(newest)
    for n in cur_window:
        sim[n] = current
    nxt = current + 1
    order = rotation_order(names, sim, birth, nxt)
    window = order[:DRIVER_WINDOW]
    due = [
        n
        for n in names
        if (n in sim and nxt - sim[n] >= STALENESS_ROUNDS)
        or (n not in sim and nxt - birth.get(n, nxt) >= GRACE_ROUNDS)
    ]
    notes = [
        f"round about to run: r{current}; projecting window for r{nxt}",
        f"due at r{nxt}: {len(due)} (grace- or staleness-bound)",
    ]
    if len(due) > DRIVER_WINDOW:
        notes.append(f"INFEASIBLE: {len(due)} due entries > {DRIVER_WINDOW} slots")
    return window, notes


def lookahead(rounds: int = 6) -> list[str]:
    """Simulate ``rounds`` future EDF windows (each one executes, then
    the next is recomputed) and report per-round slack = 50 minus the
    due-now set. Catches an oracle born into an impossible deadline
    BEFORE it becomes a red governance test."""
    from tfm_semisup_spark.queries import (
        DRIVER_WINDOW,
        GRACE_ROUNDS,
        STALENESS_ROUNDS,
        rotation_order,
    )

    names, current, newest, birth = _facts()
    sim = dict(newest)
    out = []
    for step in range(rounds):
        cur = current + step
        window = rotation_order(names, sim, birth, cur)[:DRIVER_WINDOW]
        due = [
            n
            for n in names
            if (n in sim and cur - sim[n] >= STALENESS_ROUNDS)
            or (n not in sim and cur - birth.get(n, cur) >= GRACE_ROUNDS)
        ]
        slack = DRIVER_WINDOW - len(due)
        tag = "INFEASIBLE" if slack < 0 else f"slack {slack}"
        out.append(f"r{cur}: due-now {len(due)} / {DRIVER_WINDOW} ({tag})")
        if slack < 0:
            break
        for n in window:
            sim[n] = cur
    return out


#: projected-slack floor (VERDICT r13 #7): the moment the registry
#: outgrows the fixed 50-slot window must be caught a round EARLY, so
#: the growth-aware projection warns when any lookahead round's slack
#: would drop below this under the recent registration rate.
SLACK_MIN = 5


def growth_rate(birth: dict[str, int], current: int, span: int = 3) -> float:
    """Mean oracled registrations per round over the last ``span``
    COMPLETED rounds (the in-progress round is excluded — its count is
    partial). Rounds with zero births count as zero."""
    per_round: dict[int, int] = {}
    for r in birth.values():
        per_round[r] = per_round.get(r, 0) + 1
    window = range(max(1, current - span), current)
    counts = [per_round.get(r, 0) for r in window]
    return sum(counts) / len(counts) if counts else 0.0


def projected_lookahead(
    rounds: int = 6, growth: float | None = None
) -> tuple[list[str], bool]:
    """Growth-aware feasibility projection (VERDICT r13 #7): replay
    the EDF simulation of ``lookahead`` while ALSO registering
    ``growth`` synthetic newborn oracles per future round (default:
    the measured recent rate). Steady state saturates at
    DRIVER_WINDOW * STALENESS_ROUNDS oracles; this reports the round
    where projected slack first dips below SLACK_MIN — one round
    before the static lookahead would go red. Returns (report lines,
    breached?)."""
    from tfm_semisup_spark.queries import (
        DRIVER_WINDOW,
        GRACE_ROUNDS,
        STALENESS_ROUNDS,
        rotation_order,
    )

    names, current, newest, birth = _facts()
    if growth is None:
        growth = growth_rate(birth, current)
    names = list(names)
    birth = dict(birth)
    sim = dict(newest)
    out = [
        f"growth-projected lookahead at {growth:.1f} new oracles/round "
        f"(capacity {DRIVER_WINDOW * STALENESS_ROUNDS} = "
        f"{DRIVER_WINDOW} slots x {STALENESS_ROUNDS}-round staleness)"
    ]
    breached = False
    carry = 0.0
    for step in range(rounds):
        cur = current + step
        if step > 0:  # future rounds gain the projected registrations
            carry += growth
            while carry >= 1.0:
                carry -= 1.0
                synth = f"__proj_r{cur}_{len(names)}"
                names.append(synth)
                birth[synth] = cur
        window = rotation_order(names, sim, birth, cur)[:DRIVER_WINDOW]
        due = [
            n
            for n in names
            if (n in sim and cur - sim[n] >= STALENESS_ROUNDS)
            or (n not in sim and cur - birth.get(n, cur) >= GRACE_ROUNDS)
        ]
        slack = DRIVER_WINDOW - len(due)
        tag = (
            "INFEASIBLE"
            if slack < 0
            else (f"SLACK BELOW {SLACK_MIN}" if slack < SLACK_MIN else "ok")
        )
        out.append(
            f"r{cur}: registry {len(names)}, due-now {len(due)} / "
            f"{DRIVER_WINDOW} (slack {slack}, {tag})"
        )
        if slack < SLACK_MIN:
            breached = True
        if slack < 0:
            break
        for n in window:
            sim[n] = cur
    return out, breached


def main() -> int:
    from tfm_semisup_spark.queries import DRIVER_WINDOW, rotation_order

    names, current, newest, birth = _facts()
    print(f"# current computed window (r{current}):")
    for name in rotation_order(names, newest, birth, current)[:DRIVER_WINDOW]:
        print(f'    "{name}",')
    window, notes = propose()
    for n in notes:
        print(f"# {n}")
    report = lookahead()
    for line in report:
        print(f"# lookahead {line}")
    proj, breached = projected_lookahead()
    for line in proj:
        print(f"# projection {line}")
    if breached:
        print(
            f"# projection WARNING: projected slack < {SLACK_MIN} within "
            "the horizon — slow registrations (promote instead of add) "
            "or raise coverage another way; the static lookahead above "
            "is still feasible, so this is the round-early signal."
        )
    bad = any("INFEASIBLE" in n for n in notes) or any(
        "INFEASIBLE" in line for line in report
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

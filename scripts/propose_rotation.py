"""Propose the next round's driver-window rotation.

The correctness driver checks the FIRST 50 oracled entries of
``queries()``; tests/test_window_rotation.py enforces (a) a 2-round
never-checked grace and (b) a 6-round re-window staleness bound. The
rotation itself has been hand-maintained list surgery in
``queries/__init__.py::_ORACLE_PRIORITY`` — the exact step that
silently slipped in r7. This script makes it mechanical: it recomputes
the constraint sets from ``driver_history.json`` + the checked-in
CORRECTNESS_r*.json files (assuming the CURRENT window receives its
rows this round) and prints the proposed next-window ordering, ready
to paste.

Usage: PYTHONPATH=. python scripts/propose_rotation.py
Exit 1 if the mandatory set exceeds the 50 slots (infeasible — an
addition must be displaced or deferred).
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50
GRACE = 2  # rounds an oracle may stay never-checked
STALE = 6  # rounds after which a checked oracle must re-window


def propose() -> tuple[list[str], list[str]]:
    """Returns (proposed_window, notes)."""
    from tfm_semisup_spark.queries import ORACLES, load_all_queries

    load_all_queries()
    names = list(ORACLES)
    hist = json.load(open(os.path.join(REPO, "driver_history.json")))

    last: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        rounds.append(rnd)
        for n in json.load(open(path)):
            last[n] = max(last.get(n, 0), rnd)
    this_round = (max(rounds) if rounds else 0) + 1
    # the driver will run the CURRENT first-50 window this round
    for n in names[:WINDOW]:
        last[n] = this_round
    nxt = this_round + 1

    must_new = sorted(
        (n for n in names if n not in last
         and nxt - hist.get(n, {}).get("added", nxt) >= GRACE),
        key=lambda n: (hist.get(n, {}).get("added", nxt), n),
    )
    must_stale = sorted(
        (n for n in names if n in last and nxt - last[n] >= STALE),
        key=lambda n: (last[n], n),
    )
    mandatory = must_new + must_stale
    notes = [
        f"round about to run: r{this_round}; proposing window for r{nxt}",
        f"mandatory: {len(must_new)} never-checked past grace + "
        f"{len(must_stale)} staleness-bound = {len(mandatory)}",
    ]
    if len(mandatory) > WINDOW:
        notes.append(
            f"INFEASIBLE: {len(mandatory)} mandatory entries > {WINDOW} slots"
        )
        return mandatory, notes
    # fill remaining slots oldest-checked-first (never-checked but
    # still inside grace come before anything checked)
    fill = sorted(
        (n for n in names if n not in mandatory),
        key=lambda n: (last.get(n, 0), n),
    )
    window = mandatory + fill[: WINDOW - len(mandatory)]
    notes.append(f"filled {WINDOW - len(mandatory)} slots oldest-first")
    return window, notes


def lookahead(rounds: int = 6) -> list[str]:
    """Simulate ``rounds`` future windows (each one: mandatory set +
    oldest-first fill, then assume it executes) and report per-round
    slack — catches window-budget crunches like r11's
    exactly-the-50-r5-rows situation BEFORE an oracle is born into an
    infeasible grace deadline."""
    from tfm_semisup_spark.queries import ORACLES, load_all_queries

    load_all_queries()
    names = list(ORACLES)
    hist = json.load(open(os.path.join(REPO, "driver_history.json")))
    last: dict[str, int] = {}
    rnds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        rnds.append(rnd)
        for n in json.load(open(path)):
            last[n] = max(last.get(n, 0), rnd)
    this_round = (max(rnds) if rnds else 0) + 1
    for n in names[:WINDOW]:
        last[n] = this_round
    out = []
    for step in range(1, rounds + 1):
        cur = this_round + step
        mand = [
            n
            for n in names
            if (n not in last
                and cur - hist.get(n, {}).get("added", cur) >= GRACE)
            or (n in last and cur - last[n] >= STALE)
        ]
        slack = WINDOW - len(mand)
        tag = "INFEASIBLE" if slack < 0 else f"slack {slack}"
        out.append(f"r{cur}: mandatory {len(mand)} / {WINDOW} ({tag})")
        if slack < 0:
            break
        fill = sorted(
            (n for n in names if n not in mand),
            key=lambda n: (last.get(n, 0), n),
        )
        for n in mand + fill[:slack]:
            last[n] = cur
    return out


def main() -> int:
    window, notes = propose()
    for n in notes:
        print(f"# {n}")
    for name in window:
        print(f'    "{name}",')
    for line in lookahead():
        print(f"# lookahead {line}")
    return 1 if any("INFEASIBLE" in n for n in notes) else 0


if __name__ == "__main__":
    sys.exit(main())

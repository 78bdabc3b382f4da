"""PARKED queries keep a regression trail (VERDICT r12 #4).

The r12 headline cap moved ~37 entries to ``bench.PARKED`` with the
promise that ``SPARK_GRAFT_BENCH_FULL=1 python bench.py`` keeps them
timed. This pins the promise: a round-stamped ``bench_full_r{N}.json``
must exist and be at most 2 rounds old (SCALE.md freshness rule), and
it must actually cover the current PARKED set.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: freshness bound: a full sweep at least every 2 rounds
MAX_AGE_ROUNDS = 2


def _current_round() -> int:
    # the SAME derivation bench.py uses to stamp the artifact being
    # checked (r13 review: a local reimplementation could silently
    # diverge from the stamping code if the round rule ever changes)
    from tfm_semisup_spark.queries import driver_facts

    return driver_facts(REPO)[0]


def _newest_full():
    paths = sorted(glob.glob(os.path.join(REPO, "bench_full_r*.json")))
    assert paths, (
        "no bench_full_r*.json artifact — run "
        "SPARK_GRAFT_BENCH_FULL=1 python bench.py once per 2 rounds "
        "(SCALE.md freshness rule)"
    )
    newest = max(
        paths,
        key=lambda p: int(os.path.basename(p).split("_r")[1].split(".")[0]),
    )
    with open(newest) as fh:
        return int(
            os.path.basename(newest).split("_r")[1].split(".")[0]
        ), json.load(fh)


def test_full_sweep_is_fresh():
    rnd, _ = _newest_full()
    current = _current_round()
    assert rnd >= current - MAX_AGE_ROUNDS, (
        f"newest full-sweep artifact is bench_full_r{rnd:02d}.json but the "
        f"current round is r{current} — parked queries have had no timing "
        f"record for >{MAX_AGE_ROUNDS} rounds; run "
        f"SPARK_GRAFT_BENCH_FULL=1 python bench.py"
    )


def test_full_sweep_covers_parked_set():
    """The newest artifact must time every currently-parked query —
    coverage, not just existence (a PARKED addition after the sweep
    would otherwise silently lose its trail until the next sweep)."""
    import bench

    rnd, payload = _newest_full()
    current = _current_round()
    missing = sorted(set(bench.PARKED) - set(payload.get("parked", {})))
    # ADVICE r13: an uncovered parked query may NOT coast on the
    # 2-round staleness budget — a query parked right after a sweep
    # could otherwise go two full rounds with no timing trail. Any
    # gap fails unconditionally: re-run SPARK_GRAFT_BENCH_FULL=1
    # this round to restore exact coverage. (The earlier two-assert
    # form implied a same-round artifact could pass with gaps — it
    # could not; this is the same rule stated once. r14 review.)
    assert not missing, (
        f"parked queries {missing} are not in bench_full_r{rnd:02d}.json "
        f"(current round r{current}) — run SPARK_GRAFT_BENCH_FULL=1 "
        f"python bench.py to restore their timing trail"
    )

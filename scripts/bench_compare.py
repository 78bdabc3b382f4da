"""Round-over-round bench comparison with calibration normalization.

Automates the drift analysis SCALE.md's "Bench machine-calibration
anchor" rule prescribes (VERDICT r11 #9 stretch): for every query in
both rounds' stdout payloads,

    normalized_ratio(q) = (t_q^new / t_q^old) / (calib^new / calib^old)

using ``cpu_sha256_sec`` as the divisor (r13: the steadier anchor —
in-round spread 1.17x vs spark_range_agg's 3x; the Spark anchor is
kept for the contamination flag only). A mover is flagged
OUT-OF-BAND only when its normalized ratio also escapes its own
bench_spread band (min/median .. max/median of the interleaved-pass
samples) — inside the band it's machine noise, not a plan change.

Usage:
  PYTHONPATH=. python scripts/bench_compare.py BENCH_r11.json BENCH_r12.json
  PYTHONPATH=. python scripts/bench_compare.py old.json new.json --spread bench_spread.json

Inputs may be driver artifacts ({"parsed": {...}}) or raw bench stdout
payloads ({"metric": ...}). Calib values may be the r11 scalar-median
form or the r12 [min, median, max] triple; triples additionally drive
the contaminated-run warning (max/median > CALIB_EPISODE_RATIO).
"""

from __future__ import annotations

import argparse
import json
import sys

#: keep in sync with bench.CALIB_EPISODE_RATIO (scripts/ must stay
#: importable without the repo on sys.path for ad-hoc use)
EPISODE_RATIO = 3.0


def load_payload(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d:
        d = d["parsed"]
    if d is None or "queries" not in d:
        raise SystemExit(f"{path}: no parsed bench payload")
    return d


def calib_median(payload: dict, key: str) -> float | None:
    v = (payload.get("calib") or {}).get(key)
    if v is None:
        return None
    if isinstance(v, (int, float)):
        return float(v)
    return float(v[1])  # [min, median, max]


def calib_episode(payload: dict) -> list[str]:
    """Anchors whose max/median exceeds EPISODE_RATIO (triples only)."""
    out = []
    for k, v in (payload.get("calib") or {}).items():
        if isinstance(v, list) and len(v) == 3 and v[1] > 0:
            if v[2] / v[1] > EPISODE_RATIO:
                out.append(k)
    return out


def compare(
    old: dict, new: dict, spread: dict | None
) -> tuple[list[dict], dict]:
    # Normalizer = cpu_sha256_sec (VERDICT r12 #8 / watch item #2):
    # the r12 round-over-round analysis showed spark_range_agg_sec's
    # own in-round samples span 3x (0.088-0.259 s) — a 3x-noisy anchor
    # cannot normalize 1.2x effects and AMPLIFIED noise into the
    # normalized column. cpu_sha256_sec's in-round spread was 1.17x;
    # it shares the host CPU/thermal/co-tenant state (what machine
    # normalization is for) without the JVM scheduler jitter.
    # spark_range_agg_sec is kept for the contamination FLAG only
    # (calib_episode), where its JVM-path sensitivity is the point.
    cal_old = calib_median(old, "cpu_sha256_sec")
    cal_new = calib_median(new, "cpu_sha256_sec")
    cal_ratio = (
        cal_new / cal_old if cal_old and cal_new else 1.0
    )
    spk_old = calib_median(old, "spark_range_agg_sec")
    spk_new = calib_median(new, "spark_range_agg_sec")
    rows = []
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    for name in shared:
        t_old, t_new = old["queries"][name], new["queries"][name]
        ratio = t_new / t_old if t_old else float("inf")
        norm = ratio / cal_ratio
        band = None
        verdict = "no-band"
        if spread and name in spread.get("spread", {}):
            mn, md, mx = spread["spread"][name]
            if md > 0:
                band = (round(mn / md, 3), round(mx / md, 3))
                verdict = "in-band" if band[0] <= norm <= band[1] else "OUT"
        rows.append(
            {
                "query": name,
                "old_sec": t_old,
                "new_sec": t_new,
                "ratio": round(ratio, 3),
                "normalized": round(norm, 3),
                "band": band,
                "verdict": verdict,
            }
        )
    rows.sort(key=lambda r: -r["normalized"])
    summary = {
        "shared_queries": len(shared),
        "old_total_shared": round(sum(old["queries"][n] for n in shared), 3),
        "new_total_shared": round(sum(new["queries"][n] for n in shared), 3),
        "calib_cpu_ratio": round(cal_ratio, 3),
        "calib_spark_ratio": (
            round(spk_new / spk_old, 3) if spk_old and spk_new else None
        ),
        "out_of_band": [r["query"] for r in rows if r["verdict"] == "OUT"],
        "old_contaminated_anchors": calib_episode(old),
        "new_contaminated_anchors": calib_episode(new),
    }
    return rows, summary


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--spread", default=None)
    args = ap.parse_args()
    old, new = load_payload(args.old), load_payload(args.new)
    spread = None
    if args.spread:
        with open(args.spread) as fh:
            spread = json.load(fh)
    rows, summary = compare(old, new, spread)
    for r in rows:
        band = f" band={r['band']}" if r["band"] else ""
        print(
            f"{r['verdict']:7s} {r['query']:40s} "
            f"{r['old_sec']:7.2f} -> {r['new_sec']:7.2f}  "
            f"ratio {r['ratio']:6.3f}  norm {r['normalized']:6.3f}{band}"
        )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())

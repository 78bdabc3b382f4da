"""scripts/bench_compare.py — the round-over-round normalization rule
(SCALE.md "Bench machine-calibration anchor") as executable analysis
(VERDICT r11 #9)."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "bench_compare.py",
    ),
)
bench_compare = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_compare)


def _old():
    # r11-style scalar calib medians
    return {
        "queries": {"q_flat": 2.0, "q_regressed": 2.0, "q_machine": 2.0},
        "calib": {"spark_range_agg_sec": 0.16, "cpu_sha256_sec": 0.40},
    }


def _new():
    # r12-style triples; machine uniformly 1.25x slower (calib 0.20)
    return {
        "queries": {"q_flat": 2.5, "q_regressed": 5.0, "q_machine": 2.5},
        "calib": {
            "spark_range_agg_sec": [0.19, 0.20, 0.21],
            "cpu_sha256_sec": [0.49, 0.50, 2.0],  # one episode sample
        },
    }


def _spread():
    return {
        "spread": {
            "q_flat": [1.9, 2.5, 3.0],  # band 0.76..1.2
            "q_regressed": [2.4, 2.5, 2.6],  # tight band 0.96..1.04
            # q_machine: no band row -> "no-band"
        }
    }


def test_normalization_divides_out_machine_drift():
    rows, summary = bench_compare.compare(_old(), _new(), _spread())
    by = {r["query"]: r for r in rows}
    # raw ratio 1.25 but calib ratio 1.25 -> normalized 1.0
    # (r13: the PRIMARY normalizer is the cpu anchor; the spark anchor
    # is reported but only drives the contamination flag)
    assert summary["calib_cpu_ratio"] == 1.25
    assert summary["calib_spark_ratio"] == 1.25
    assert abs(by["q_flat"]["normalized"] - 1.0) < 1e-9
    assert by["q_flat"]["verdict"] == "in-band"
    # a genuine 2.5x regression normalizes to 2.0 and escapes its band
    assert abs(by["q_regressed"]["normalized"] - 2.0) < 1e-9
    assert by["q_regressed"]["verdict"] == "OUT"
    assert summary["out_of_band"] == ["q_regressed"]
    # no spread row -> explicit no-band, never a silent pass/fail
    assert by["q_machine"]["verdict"] == "no-band"
    # rows sorted most-suspicious first
    assert rows[0]["query"] == "q_regressed"


def test_calib_forms_and_episode_flag():
    assert bench_compare.calib_median(_old(), "spark_range_agg_sec") == 0.16
    assert bench_compare.calib_median(_new(), "spark_range_agg_sec") == 0.20
    assert bench_compare.calib_episode(_old()) == []  # scalars: no flag
    assert bench_compare.calib_episode(_new()) == ["cpu_sha256_sec"]


def test_driver_artifact_unwrapping(tmp_path):
    import json

    p = tmp_path / "BENCH_rX.json"
    p.write_text(json.dumps({"n": 12, "parsed": _old()}))
    payload = bench_compare.load_payload(str(p))
    assert payload["queries"]["q_flat"] == 2.0


def test_episode_ratio_synced_with_bench():
    """ADVICE r12: EPISODE_RATIO is a hand-copy of
    bench.CALIB_EPISODE_RATIO (scripts/ stays importable standalone);
    pin the sync so a bench change can't silently diverge compare
    reports from the run that produced the payload."""
    import bench

    assert bench_compare.EPISODE_RATIO == bench.CALIB_EPISODE_RATIO


def test_ann_warm_at_sf_rule():
    """VERDICT r12 #2: the ANN tier warms at the BENCH SF before the
    timed passes (SF-dependent kernels: adaptive centroid counts,
    Arrow batch shapes, JIT tiers), so the spread band measures plan
    stability rather than first-sample warmup. Pin the list so a
    future HEADLINE edit can't silently drop the rule."""
    import bench

    assert bench.ANN_WARM_AT_SF, "ANN warm-at-SF list must not be empty"
    for name in bench.ANN_WARM_AT_SF:
        assert name in bench.HEADLINE + bench.PARKED, name


def test_ann_band_rule_is_the_accepted_end_state():
    """VERDICT r13 #2 closure: the ANN tier's residual bench spread
    (pass-position JVM/GC state — back-to-back it holds <= 1.3, full
    interleaved runs measured up to ~1.5 on ivfpq even with the
    two-pass warm-at-SF) is normalized by the entry's OWN recorded
    band, and that rule must fail loudly the moment a normalized move
    escapes the band. Uses ivfpq's real r13 close band
    [2.48, 3.20, 4.53] (ratio band 0.775..1.416)."""
    old = {
        "queries": {"similarity_ivfpq_topk": 3.20},
        "calib": {"cpu_sha256_sec": 0.40},
    }
    spread = {"spread": {"similarity_ivfpq_topk": [2.48, 3.20, 4.53]}}

    # a raw 1.40x move on a stable machine: inside the recorded band —
    # accepted as measurement spread, NOT a regression
    new_inband = {
        "queries": {"similarity_ivfpq_topk": 4.48},
        "calib": {"cpu_sha256_sec": 0.40},
    }
    rows, summary = bench_compare.compare(old, new_inband, spread)
    assert rows[0]["verdict"] == "in-band"
    assert summary["out_of_band"] == []

    # a 1.50x normalized move escapes the band -> loud OUT
    new_out = {
        "queries": {"similarity_ivfpq_topk": 4.80},
        "calib": {"cpu_sha256_sec": 0.40},
    }
    rows, summary = bench_compare.compare(old, new_out, spread)
    assert rows[0]["verdict"] == "OUT"
    assert summary["out_of_band"] == ["similarity_ivfpq_topk"]

    # machine drift divides out BEFORE the band read: same 1.5x raw
    # move on a machine the cpu anchor says is 1.5x slower -> in-band
    new_machine = {
        "queries": {"similarity_ivfpq_topk": 4.80},
        "calib": {"cpu_sha256_sec": 0.60},
    }
    rows, summary = bench_compare.compare(old, new_machine, spread)
    assert rows[0]["verdict"] == "in-band"

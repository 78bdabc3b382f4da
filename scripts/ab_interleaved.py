"""Interleaved parent-worktree-vs-tree A/B in BENCH context (r15,
VERDICT r14 item 1).

Runs the SAME query from two code versions — the current tree
(``tfm_semisup_spark``) and a renamed copy of a parent commit's package
(``tfm_old``, prepared by copying the worktree package and sed-renaming
the absolute imports) — inside ONE session, with bench.py's exact
isolation (clearCache + py/JVM GC between every timing, noop sink,
sf0.001 warmup), run-major interleaved with the old/new order swapped
every pass so a machine-state episode cannot systematically favor one
side.

Usage:
  # prepare: git worktree add /tmp/r15_parent <parent-sha>
  #          cp -r /tmp/r15_parent/tfm_semisup_spark /tmp/oldpkg/tfm_old
  #          sed -i 's/tfm_semisup_spark/tfm_old/g' /tmp/oldpkg/tfm_old/**
  SPARK_GRAFT_AB_RUNS=8 PYTHONPATH=.:/tmp/oldpkg \
    python scripts/ab_interleaved.py q1 q2 ...

Output: per-query per-version sample lists + medians + ratio, JSON to
/tmp/ab_result.json and one summary line per query to stdout.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "8"))
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: ab_interleaved.py <query> [<query> ...]")

    from tfm_old.queries import QUERIES as OLD_QUERIES
    from tfm_old.queries import load_all_queries as old_load
    from tfm_semisup_spark.queries import QUERIES as NEW_QUERIES
    from tfm_semisup_spark.queries import load_all_queries as new_load
    from tfm_semisup_spark.session import get_spark

    old_load()
    new_load()
    for n in names:
        if n not in NEW_QUERIES or n not in OLD_QUERIES:
            raise SystemExit(f"{n} missing from a registry")

    spark = get_spark(app_name="ab-interleaved")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def isolate() -> None:
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()

    def timed(fn) -> float:
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - start
        isolate()
        return round(dt, 3)

    # bench-protocol warmup: every (query, version) once at the tiny SF
    for n in names:
        for q in (OLD_QUERIES[n], NEW_QUERIES[n]):
            q(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
    isolate()

    samples: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in names
    }
    for p in range(runs):
        for n in names:
            order = (
                [("old", OLD_QUERIES[n]), ("new", NEW_QUERIES[n])]
                if p % 2 == 0
                else [("new", NEW_QUERIES[n]), ("old", OLD_QUERIES[n])]
            )
            for tag, fn in order:
                samples[n][tag].append(timed(fn))

    out = {}
    for n in names:
        mo = statistics.median(samples[n]["old"])
        mn = statistics.median(samples[n]["new"])
        out[n] = {
            "old": samples[n]["old"],
            "new": samples[n]["new"],
            "old_median": round(mo, 3),
            "new_median": round(mn, 3),
            "speedup_new_over_old": round(mo / mn, 3) if mn else None,
        }
        print(
            f"{n}: old_med={mo:.3f} new_med={mn:.3f} "
            f"speedup={mo / mn if mn else float('nan'):.3f}",
            flush=True,
        )
    spark.stop()
    with open("/tmp/ab_result.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

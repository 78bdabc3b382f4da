"""Per-query profiling harness for the optimization rounds (guide §1).

For each named query at $SPARK_GRAFT_SF_DIR (default sf0.1):

- times PLAN CONSTRUCTION (the ``fn(spark, sf_dir)`` call — includes
  any internal bounded collects/checkpoints the operator runs) and
  EXECUTION (noop sink write, guide §1.4) separately, N runs each with
  the bench's clearCache + py/JVM GC isolation;
- labels every job (guide §1.5) and, with the UI enabled, pulls the
  REST API for per-job wall + per-stage executorRunTime / shuffle
  bytes so the expensive stage is identified by measurement, not by
  eyeballing the plan;
- writes ``.explain("formatted")`` to /tmp/plans/<name>.txt.

Usage:
  PYTHONPATH=. python scripts/profile_queries.py q1 q2 ...
  SPARK_GRAFT_PROFILE_RUNS=3 PYTHONPATH=. python scripts/profile_queries.py q1
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

from tfm_semisup_spark.queries import QUERIES, load_all_queries
from tfm_semisup_spark.session import get_spark


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=5) as r:
        return json.loads(r.read())


def _iso_jobs(base: str, app: str, since_job: int):
    jobs = _rest(f"{base}/applications/{app}/jobs")
    return [j for j in jobs if j["jobId"] >= since_job]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    names = sys.argv[1:]
    load_all_queries()
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(
        app_name="profile-queries", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = "http://localhost:4040/api/v1"
    try:
        app = _rest(f"{base}/applications")[0]["id"]
    except Exception:
        app = None

    os.makedirs("/tmp/plans", exist_ok=True)
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        # warmup at the tiny SF (bench protocol)
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()

        build_ts, exec_ts = [], []
        job_rows = []
        for r in range(runs):
            first_job = 0
            if app:
                try:
                    jobs = _rest(f"{base}/applications/{app}/jobs")
                    first_job = (max(j["jobId"] for j in jobs) + 1) if jobs else 0
                except Exception:
                    app = None
            sc.setJobDescription(f"{name}: build r{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            sc.setJobDescription(f"{name}: exec r{r}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobDescription(None)
            build_ts.append(round(t1 - t0, 3))
            exec_ts.append(round(t2 - t1, 3))
            if r == 0:
                import contextlib
                import io as _io

                buf = _io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(f"/tmp/plans/{name}.txt", "w") as f:
                    f.write(buf.getvalue())
                if app:
                    try:
                        from datetime import datetime

                        def _t(s):
                            return datetime.strptime(
                                s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f"
                            ).timestamp()

                        for j in _iso_jobs(base, app, first_job):
                            dur = None
                            if j.get("submissionTime") and j.get("completionTime"):
                                dur = round(
                                    _t(j["completionTime"]) - _t(j["submissionTime"]),
                                    3,
                                )
                            job_rows.append(
                                {
                                    "jobId": j["jobId"],
                                    "desc": (j.get("description") or "")[:60],
                                    "durSec": dur,
                                    "stages": j.get("stageIds"),
                                }
                            )
                    except Exception:
                        pass
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
        out[name] = {
            "build": build_ts,
            "exec": exec_ts,
            "total_median": round(
                sorted(b + e for b, e in zip(build_ts, exec_ts))[runs // 2], 3
            ),
            "jobs_run0": job_rows,
        }
        print(
            f"{name}: build={build_ts} exec={exec_ts}",
            flush=True,
        )

    spark.stop()
    with open("/tmp/profile_result.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({n: d["total_median"] for n, d in out.items()}))


if __name__ == "__main__":
    main()

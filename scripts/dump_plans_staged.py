"""Stage-aware plan dumper (r15, VERDICT r14 item 8).

``explain("formatted")`` on a query whose pipeline localCheckpoints
shows only the post-checkpoint stage — the r14 winnowing after-plan was
identical to its before-plan modulo expression IDs because the changed
stage sat ABOVE a checkpoint, making the evidence vacuous. This dumper
intercepts every ``localCheckpoint``/``checkpoint`` call made while the
query plan is being built and records each intercepted frame's plan
BEFORE materialization, then the final plan, so the dump shows every
stage of a checkpointed pipeline.

Usage:
  PYTHONPATH=. python scripts/dump_plans_staged.py <outdir> <suffix> q1 q2 ...
  # writes <outdir>/<query>_<suffix>.txt with one section per stage

The interception monkeypatches pyspark's DataFrame methods for the
duration of the plan build only (the dump itself is side-effect-free:
checkpoints still run, results unchanged).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def _fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def dump_staged(spark, fn, sf_dir: str) -> str:
    """Build fn(spark, sf_dir) with checkpoint interception; return the
    staged plan text (pre-checkpoint stage plans + final plan)."""
    # Spark 4: pyspark.sql.DataFrame is the abstract facade; the
    # concrete class (which defines localCheckpoint) is
    # pyspark.sql.classic.dataframe.DataFrame — patch that one
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # Spark 3.x
        from pyspark.sql import DataFrame

    stages: list[str] = []
    orig_local = DataFrame.localCheckpoint
    orig_ckpt = DataFrame.checkpoint

    def rec(df, kind):
        stages.append(f"=== stage {len(stages) + 1}: pre-{kind} plan ===\n" + _fmt(df))

    def patched_local(self, eager=True):
        rec(self, "localCheckpoint")
        return orig_local(self, eager)

    def patched_ckpt(self, eager=True, reliableCheckpoint=True):
        rec(self, "checkpoint")
        try:
            return orig_ckpt(self, eager, reliableCheckpoint)
        except TypeError:
            return orig_ckpt(self, eager)

    DataFrame.localCheckpoint = patched_local
    DataFrame.checkpoint = patched_ckpt
    try:
        df = fn(spark, sf_dir)
    finally:
        DataFrame.localCheckpoint = orig_local
        DataFrame.checkpoint = orig_ckpt
    stages.append("=== final plan ===\n" + _fmt(df))
    return "\n\n".join(stages) + "\n"


def main() -> None:
    from tfm_semisup_spark.queries import QUERIES, load_all_queries
    from tfm_semisup_spark.session import get_spark

    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all_queries()
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump-plans-staged", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        text = dump_staged(spark, QUERIES[name], sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({text.count('=== stage')} pre-checkpoint stages)")
    spark.stop()


if __name__ == "__main__":
    main()

"""SparkSession factory with scale-oriented defaults.

The reference (Dguipla/TFM-SemiSup) ran on Databricks Spark 3.0.1 with
cluster defaults and no tuning (SURVEY.md §4). Here we bake in the
settings that matter when the same logical plans run against ~100 TB on
a 1000-executor cluster, while remaining correct on local[N]:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) — replaces hand-tuned shuffle partition counts.
- Arrow on for the few pandas boundaries (never in hot paths).
- Parquet filter/column pushdown left at defaults (on) — all queries
  are expressed declaratively so Catalyst can push them.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "tfm-semisup-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster, pass ``master=None`` and let spark-submit decide;
    locally defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # local[32] puts all executor work on the driver heap: 8g gave
        # multi-second bimodal GC spikes at sf0.1 (measured: same query
        # 5.6s warm / 16.5s under heap pressure); 24g removes them and
        # is still <20% of the box. On a real cluster executor memory
        # is set by spark-submit and this only sizes the driver.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

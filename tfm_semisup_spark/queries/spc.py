"""Statistical process control: p-chart on the daily error share.

``error_pchart_daily`` runs the classic attribute control chart
(Shewhart p-chart) over the event stream: per day t, the error share
p_t = e_t/n_t is tested against the centerline p̄ = E/N with the
3σ binomial limits p̄ ± 3·sqrt(p̄(1−p̄)/n_t) (limits vary per day with
the day's volume). Days outside the limits are the special-cause
signals an operations pipeline alarms on — the monitoring companion
to cusum_changepoint_daily (which locates ONE mean shift; the p-chart
flags every excursion).

Arithmetic parity — the whole test is EXACT INTEGER (no sqrt ever
evaluated): squaring the exceedance and clearing denominators,

    |p_t − p̄| > 3·sqrt(p̄(1−p̄)/n_t)
      ⟺  (e_t·N − E·n_t)² > 9·E·(N−E)·n_t      (and the sign of
                                                e_t·N − E·n_t picks
                                                high vs low)

with every product in DECIMAL(38,0)/HUGEINT ((e·N)² passes BIGINT at
~3·10⁹ error·event volume). Only the reported centerline ppm is a
quantized integer division.

100 TB shape: one fact-scale groupBy to the calendar-bounded day
grid; the test is a per-grid-row integer comparison; the summary is
one aggregate over the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

_DEC = "decimal(38,0)"

PCHART_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*)::HUGEINT AS n_t,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::HUGEINT
           AS e_t
  FROM events GROUP BY 1
),
tot AS (SELECT SUM(n_t) AS nn, SUM(e_t) AS ee FROM daily),
tested AS (
  SELECT d.day, d.n_t, d.e_t,
         (d.e_t * t.nn - t.ee * d.n_t) AS dev,
         (d.e_t * t.nn - t.ee * d.n_t) * (d.e_t * t.nn - t.ee * d.n_t)
           AS dev2,
         9 * t.ee * (t.nn - t.ee) * d.n_t AS bound
  FROM daily d CROSS JOIN tot t
)
SELECT (SELECT COUNT(*) FROM daily)::BIGINT AS n_days,
       (SELECT nn FROM tot)::BIGINT AS n_events,
       (SELECT ee FROM tot)::BIGINT AS n_errors,
       CAST(((SELECT ee FROM tot) * 1000000) // (SELECT nn FROM tot)
            AS BIGINT) AS pbar_ppm,
       SUM(CASE WHEN dev > 0 AND dev2 > bound THEN 1 ELSE 0 END)::BIGINT
         AS n_out_high,
       SUM(CASE WHEN dev < 0 AND dev2 > bound THEN 1 ELSE 0 END)::BIGINT
         AS n_out_low,
       CAST(COALESCE(MIN(CASE WHEN dev2 > bound THEN day END), DATE '1970-01-01')
            AS VARCHAR) AS first_out_day,
       CAST(COALESCE(MAX(CASE WHEN dev2 > bound THEN day END), DATE '1970-01-01')
            AS VARCHAR) AS last_out_day
FROM tested
"""


@register("error_pchart_daily", PCHART_ORACLE)
def error_pchart_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart summary of the daily error share: one row
    (n_days, n_events, n_errors, pbar_ppm, n_out_high, n_out_low,
    first_out_day, last_out_day) — the 3σ test entirely in exact
    integers."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast(_DEC).alias("n_t"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast(_DEC)
        .alias("e_t"),
    )
    tot = daily.agg(F.sum("n_t").alias("nn"), F.sum("e_t").alias("ee"))
    tested = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("e_t") * F.col("nn") - F.col("ee") * F.col("n_t")).alias(
            "dev"
        ),
        (
            (F.col("e_t") * F.col("nn") - F.col("ee") * F.col("n_t"))
            * (F.col("e_t") * F.col("nn") - F.col("ee") * F.col("n_t"))
        ).alias("dev2"),
        (
            F.lit(9) * F.col("ee") * (F.col("nn") - F.col("ee")) * F.col("n_t")
        ).alias("bound"),
        "nn",
        "ee",
    )
    out = F.col("dev2") > F.col("bound")
    agg = tested.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("nn").alias("nn"),
        F.max("ee").alias("ee"),
        F.sum(F.when((F.col("dev") > 0) & out, 1).otherwise(0))
        .cast("bigint")
        .alias("n_out_high"),
        F.sum(F.when((F.col("dev") < 0) & out, 1).otherwise(0))
        .cast("bigint")
        .alias("n_out_low"),
        F.coalesce(
            F.min(F.when(out, F.col("day"))), F.lit("1970-01-01").cast("date")
        )
        .cast("string")
        .alias("first_out_day"),
        F.coalesce(
            F.max(F.when(out, F.col("day"))), F.lit("1970-01-01").cast("date")
        )
        .cast("string")
        .alias("last_out_day"),
    )
    num = (F.col("ee") * F.lit(1_000_000)).cast(_DEC)
    den = F.col("nn").cast(_DEC)
    return agg.select(
        "n_days",
        F.col("nn").cast("bigint").alias("n_events"),
        F.col("ee").cast("bigint").alias("n_errors"),
        ((num - F.pmod(num, den)) / den).cast("bigint").alias("pbar_ppm"),
        "n_out_high",
        "n_out_low",
        "first_out_day",
        "last_out_day",
    )

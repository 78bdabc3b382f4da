"""Third batch of TPC-H query shapes: Q2 / Q11 / Q20 analogs.

These three are the classic PARTSUPP queries. The synthetic schema
(TESTDATA.md) has no partsupp table, so the supply relation DERIVES
from lineitem — the natural analog at a data-lake house where the
order facts ARE the supply evidence:

    supply(ps_partkey, ps_suppkey,
           ps_supplycost = round(avg(l_extendedprice / l_quantity), 4),
           ps_availqty   = sum(l_quantity))

``ps_supplycost`` is ROUNDED AT CONSTRUCTION on both engines, so every
downstream comparison (Q2's correlated MIN equality in particular)
compares identical doubles instead of racing last-ulp average
differences.

Shapes covered (and their idiomatic Spark decorrelation):

- **Q2 minimum-cost supplier**: correlated scalar MIN subquery over
  the region-restricted supply -> a per-part MIN aggregate joined back
  on (partkey, cost) equality. Region/nation/part are broadcast dims;
  the only fact shuffles are the supply group-by and the min-agg, both
  keyed on partkey.
- **Q11 important stock**: aggregate-HAVING against a scalar subquery
  (share of total) -> a one-row total cross-joined in. Scale note:
  the scalar total is a second scan of the same tiny aggregate, not of
  the fact table.
- **Q20 excess availability**: nested IN subqueries with a correlated
  per-part aggregate -> dominant-supplier semi-join (qty > 50% of the
  part's year total) restricted to a part slice.

Reference parity: extends the subquery battery of
`queries/relational6.py` / `tpch_shapes.py` (SURVEY.md §2.2 scalar/
IN/correlated subqueries) to the partsupp join topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.queries import register

_SUPPLY_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         round(avg(l_extendedprice / l_quantity), 4) AS ps_supplycost,
         SUM(l_quantity)::BIGINT AS ps_availqty
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
"""


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
            "ps_supplycost"
        ),
        F.sum("l_quantity").cast("long").alias("ps_availqty"),
    )


Q2_ORACLE = f"""
WITH supply AS ({_SUPPLY_SQL}),
regional AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
cand AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, rg.s_suppkey, rg.s_name,
         rg.s_acctbal, rg.n_name
  FROM supply ps JOIN regional rg ON ps.ps_suppkey = rg.s_suppkey
),
mincost AS (
  SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
  FROM cand GROUP BY ps_partkey
)
SELECT round(c.s_acctbal, 2) AS s_acctbal, c.s_name, c.n_name,
       p.p_partkey, p.p_name, c.ps_supplycost AS supplycost
FROM cand c
JOIN mincost m ON c.ps_partkey = m.ps_partkey AND c.ps_supplycost = m.min_cost
JOIN part p ON c.ps_partkey = p.p_partkey
WHERE p.p_type = 'PROMO'
ORDER BY s_acctbal DESC, c.n_name, c.s_name, p.p_partkey
LIMIT 20
"""


@register("q2_min_cost_supplier", Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: for PROMO parts, the EUROPE supplier(s) at the
    per-part minimum supply cost. Correlated MIN decorrelated into a
    per-part aggregate joined back on cost equality."""
    supply = _supply(spark, sf_dir)
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    regional = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.join(reg, nat["n_regionkey"] == reg["r_regionkey"])),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = supply.join(
        regional, supply["ps_suppkey"] == regional["s_suppkey"]
    ).select(
        "ps_partkey", "ps_supplycost", "s_suppkey", "s_name", "s_acctbal", "n_name"
    )
    mincost = cand.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    # Filtered part is STILL SF-linear (p_type is ~constant
    # selectivity) — no broadcast hint, AQE decides.
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    return (
        cand.join(mincost, "ps_partkey")
        .where(F.col("ps_supplycost") == F.col("min_cost"))
        .join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


Q11_FRACTION = 0.01

Q11_ORACLE = f"""
WITH supply AS ({_SUPPLY_SQL}),
regional AS (
  SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS part_value
  FROM supply ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
),
byval AS (
  SELECT ps_partkey, round(SUM(part_value), 2) AS value
  FROM regional GROUP BY ps_partkey
),
total AS (SELECT round(SUM(part_value) * {Q11_FRACTION}, 2) AS cutoff FROM regional)
SELECT ps_partkey, value
FROM byval CROSS JOIN total
WHERE value > cutoff
ORDER BY value DESC, ps_partkey
"""


@register("q11_important_stock", Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: ASIA-supplied parts whose stock value exceeds
    Q11_FRACTION of the regional total (scalar-subquery HAVING). Both
    the per-part value and the cutoff are ROUNDED (2 dp) before the
    comparison on both engines — row MEMBERSHIP must not race
    summation-order ulps (the repo's round-before-compare rule)."""
    supply = _supply(spark, sf_dir)
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.join(reg, nat["n_regionkey"] == reg["r_regionkey"])),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    # sup is region-filtered SUPPLIER — SF-linear, no hint (AQE).
    regional = supply.join(
        sup, supply["ps_suppkey"] == sup["s_suppkey"]
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("part_value"),
    )
    byval = regional.groupBy("ps_partkey").agg(
        F.round(F.sum("part_value"), 2).alias("value")
    )
    total = F.broadcast(
        regional.agg(
            F.round(F.sum("part_value") * Q11_FRACTION, 2).alias("cutoff")
        )
    )
    return (
        byval.crossJoin(total)
        .where(F.col("value") > F.col("cutoff"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


# Nonzero-membership Q11 variant (VERDICT r11 #5): the classic
# fraction-of-total cutoff yields 0 rows at sf>=0.01 (part count grows
# with SF while each part's share shrinks), so the driver row passed
# vacuously — an engine bug that wrongly emptied the result would
# still "match". This variant keeps the scalar-subquery-HAVING
# topology (two-level supply aggregate, one-row total cross-joined in)
# but cuts at 1.5x the MEAN part value: SF-invariant nonzero
# membership (a skewed value distribution always has parts above 1.5x
# mean). The math is EXACT INTEGER end-to-end: per-(part,supplier)
# value = SUM of 2-dp extendedprice in cents (exact BIGINT — a first
# cut reused _SUPPLY_SQL's ps_supplycost, but that is round(avg(),4)
# of a double quotient, and the engines' avg summation order flipped
# the 4th decimal on 4 of 275 parts at sf0.01); the compare clears
# denominators (2*value*n > 3*total) in DECIMAL(38,0)/HUGEINT — no
# summation-order ULP can flip a row or a value on either engine.
Q11_TOP_ORACLE = """
WITH supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS ps_value_c
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
regional AS (
  SELECT ps.ps_partkey, ps.ps_value_c
  FROM supply ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
),
byval AS (
  SELECT ps_partkey, CAST(SUM(ps_value_c) AS BIGINT) AS value_c
  FROM regional GROUP BY ps_partkey
),
total AS (
  SELECT CAST(SUM(value_c) AS HUGEINT) AS total_c,
         COUNT(*) AS n_parts
  FROM byval
)
SELECT ps_partkey, value_c
FROM byval CROSS JOIN total
WHERE 2 * CAST(value_c AS HUGEINT) * n_parts > 3 * total_c
ORDER BY value_c DESC, ps_partkey
"""


@register("q11_top_value_parts", Q11_TOP_ORACLE)
def q11_top_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog with guaranteed-nonzero membership: ASIA parts
    whose stock value exceeds 1.5x the mean per-part value (scalar-
    subquery HAVING). Companion to ``q11_important_stock`` whose
    fraction-of-total cutoff is legitimately empty at sf>=0.01; this
    one exercises the membership logic with actual data at every SF
    (VERDICT r11 #5). All-integer compare — see the oracle comment."""
    li = load_table(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "ps_value_c"
        )
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.join(reg, nat["n_regionkey"] == reg["r_regionkey"])),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    regional = supply.join(
        sup, supply["ps_suppkey"] == sup["s_suppkey"]
    ).select("ps_partkey", "ps_value_c")
    byval = regional.groupBy("ps_partkey").agg(
        F.sum("ps_value_c").alias("value_c")
    )
    total = F.broadcast(
        byval.agg(
            F.sum(F.col("value_c").cast("decimal(38,0)")).alias("total_c"),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )
    return (
        byval.crossJoin(total)
        .where(
            F.lit(2) * F.col("value_c").cast("decimal(38,0)") * F.col("n_parts")
            > F.lit(3) * F.col("total_c")
        )
        .select("ps_partkey", "value_c")
        .orderBy(F.col("value_c").desc(), "ps_partkey")
    )


Q20_ORACLE = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
part_total AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
),
dominant AS (
  SELECT DISTINCT sh.l_suppkey
  FROM shipped sh
  JOIN part_total pt ON sh.l_partkey = pt.l_partkey
  JOIN part p ON sh.l_partkey = p.p_partkey
  WHERE p.p_type = 'SMALL' AND sh.qty > 0.5 * pt.total_qty
)
SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS s_acctbal, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s.s_name
"""


@register("q20_excess_availability", Q20_ORACLE)
def q20_excess_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: suppliers who shipped more than half of a
    SMALL part's 1996 volume (nested-IN with correlated per-part
    aggregate, planned as two partkey aggregates + a left-semi join)."""
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = shipped.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty")
    )
    # Filtered part is still SF-linear — no broadcast hint, AQE decides.
    small = load_table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    dominant = (
        shipped.join(part_total, "l_partkey")
        .join(small, F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        load_table(spark, sf_dir, "supplier")
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "n_name",
        )
        .orderBy("s_name")
    )

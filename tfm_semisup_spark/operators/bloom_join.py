"""Bloom semi-join reduction: prune the fact side of a join with a
codegen bitset filter BEFORE the shuffle.

The classic distributed-join optimization (Bloom 1970; the manual form
of Spark's `spark.sql.optimizer.runtime.bloomFilter` injection, which
only fires for shuffle-join shapes the optimizer recognizes): when the
dimension side of a join is selective, most fact rows shuffle only to
be dropped at the join. Building an 8 KiB bloom bitset from the dim
keys and probing it in a scan-side Filter removes those rows before
the Exchange — shuffle volume drops to (matching ∪ false-positive)
rows while the exact join afterwards keeps semantics identical.

Design (all shared with the bloom contamination screen,
``queries/contamination.py``):
- positions are two independent 16-bit slices of ONE md5 digest of the
  key string (``operators/layout.py::md5_uniform16`` — portable text,
  so a DuckDB oracle can reproduce the filter decision exactly if ever
  needed; here the ORACLE is the plain join — the driver compare
  itself proves the pruning lossless);
- the bitset is a ≤1024-row aggregate collected to the driver
  (bounded by the FIXED bitset size, not by data) and inlined as an
  array literal, so the probe is whole-stage-codegen over the scan —
  no join, no broadcast variable;
- no false negatives by construction (every dim key sets its own
  bits), so pruned-join ≡ plain-join for ANY key set; false positives
  only cost shuffle bytes.

100 TB: the dim aggregate is one pass over the (filtered) dimension;
the fact probe is scan-local; the surviving shuffle carries only
~selectivity·facts + FP·facts rows. For dim key sets where 2 probes ×
65536 bits saturates (≥ ~10k keys), raise BLOOM_JOIN_WORDS or fall
back to a plain join — saturation makes the filter pass-through
(correct, just not reductive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfm_semisup_spark.operators.layout import md5_uniform16_spark_sql

#: 64-bit words in the bitset (65536 bits = 8 KiB)
BLOOM_JOIN_WORDS = 1024


def build_key_bloom(dim: DataFrame, key: str) -> list[int]:
    """Aggregate the dim side's key set into a 65536-bit bloom bitset
    (two positions per key from one md5 digest). Returns the bitset as
    a list of BLOOM_JOIN_WORDS signed 64-bit words. The collect is
    bounded by the bitset size (≤1024 rows), never by the data."""
    digest = dim.select(F.md5(F.col(key).cast("string")).alias("d"))
    pos = (
        digest.select(F.expr(md5_uniform16_spark_sql("d", 1)).alias("pos"))
        .union(
            digest.select(F.expr(md5_uniform16_spark_sql("d", 5)).alias("pos"))
        )
        .distinct()
    )
    rows = (
        pos.groupBy(F.expr("CAST(pos DIV 64 AS INT)").alias("widx"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))"
            ).alias("bits")
        )
        .collect()
    )
    bloom = [0] * BLOOM_JOIN_WORDS
    for r in rows:
        bloom[r["widx"]] = r["bits"]
    return bloom


def bloom_probe_predicate(key: str, bloom: list[int]) -> str:
    """SQL boolean testing both bloom positions of ``key`` against the
    inlined bitset — ONE md5 reference via a lateral-style named
    struct is not needed: codegen subexpression elimination collapses
    the two digest references (same expression text)."""
    arr = "array(" + ",".join(f"CAST({w} AS BIGINT)" for w in bloom) + ")"
    digest = f"md5(CAST({key} AS STRING))"

    def bit(start: int) -> str:
        p = md5_uniform16_spark_sql(digest, start)
        return (
            f"(element_at({arr}, CAST({p} DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))) <> 0"
        )

    return f"({bit(1)} AND {bit(5)})"


def bloom_semijoin(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Exact inner join of ``fact`` with ``dim`` where the fact side is
    bloom-pruned before the shuffle. Result rows are identical to the
    plain join for any inputs (no false negatives)."""
    bloom = build_key_bloom(dim, dim_key)
    pruned = fact.where(F.expr(bloom_probe_predicate(fact_key, bloom)))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])

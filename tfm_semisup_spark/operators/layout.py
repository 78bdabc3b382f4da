"""Physical table layout: compaction and sort-for-data-skipping.

At 100 TB the dominant cost of many pipelines is not the query plan
but the FILE LAYOUT it scans:

- the small-files problem: a streaming sink or over-parallel writer
  leaves thousands of KB-sized files; every scan then pays per-file
  open/footer costs and the scheduler drowns in splits.
  ``compact_parquet`` rewrites a table to ~target-sized files, sizing
  the shuffle from the ACTUAL input bytes (no guessed constants).
- min/max skipping: parquet stores per-row-group column min/max;
  Spark prunes row groups whose range can't match a pushed filter.
  That only bites when the layout puts similar values together —
  ``write_range_sorted`` range-partitions + sorts so each file owns a
  tight, near-disjoint range of the sort key (single-key locality,
  the common case: time-range scans over event data), and
  ``write_zorder`` interleaves several keys' bucket bits (Morton
  order) so predicates on ANY participating column skip.

Both are metadata-level rewrites: one shuffle (or none for coalesce
compaction), no Python, schema untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def parquet_bytes(path: str) -> int:
    """Total bytes of parquet data under path (local filesystems; on a
    cluster store you'd ask the FileSystem API the same question)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``in_path`` as ~``target_file_bytes`` parquet files at
    ``out_path``; returns the chosen file count.

    File count = ceil(input_bytes / target) from the measured input —
    compaction jobs that hard-code partition counts drift as tables
    grow. Uses ``repartition`` (round-robin, one shuffle) rather than
    ``coalesce``: coalesce(n) would chain tasks to at most the current
    file count and skews output sizes when input files are uneven;
    the shuffle is the price of even, parallel-written output.
    """
    n_bytes = parquet_bytes(in_path)
    n_files = max(1, -(-n_bytes // target_file_bytes))
    df = spark.read.parquet(in_path)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_range_sorted(
    df: DataFrame,
    out_path: str,
    sort_col: str,
    n_files: int,
) -> None:
    """Write ``df`` range-partitioned and sorted by ``sort_col`` so
    every output file (and every row group inside it) covers a tight
    slice of the key space — selective range predicates then skip
    whole files/row groups via parquet min/max stats instead of
    scanning and discarding.

    ``repartitionByRange`` samples the key distribution for balanced
    cuts (skew-safe); ``sortWithinPartitions`` orders inside each file
    so row-group stats are tight too. Ranges of adjacent files can
    overlap only at sampled boundary keys."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(out_path)
    )


def zorder_column(
    df: DataFrame, cols: list[str], bits: int = 6, mode: str = "quantile"
):
    """Column expression: the Z-order (Morton) key interleaving the
    ``bits``-bit bucket ids of ``cols``.

    Bucketing modes (both bounded driver-side work, both codegen on
    the executors — no UDF anywhere):

    - ``"quantile"`` (default, the Delta/Iceberg OPTIMIZE ZORDER
      shape): boundaries from ``approxQuantile`` (one pass, 2^bits - 1
      scalars on the driver); the bucket id is a flat sum of
      ``value >= boundary`` terms — equal-MASS buckets, so skewed
      columns keep their full bit budget. Like ``repartitionByRange``,
      the sampled boundaries make the key sample-dependent, not a
      pure function of the row.
    - ``"uniform"``: ``width_bucket`` over the measured min/max (two
      scalars per column). Stateless and exactly reproducible from the
      row values, but a skewed column collapses into few buckets and
      loses skipping power on that dimension.

    The bucket bits are then interleaved columnar: bit i of column j
    lands at position i * n_cols + j — an unrolled expression of
    bits x n_cols shift/or terms (12 at the 6-bit / 2-column default),
    entirely inside whole-stage codegen.
    """
    from pyspark.sql import functions as F

    n = 2**bits
    bucketed = []
    if mode == "quantile":
        probs = [i / n for i in range(1, n)]
        all_bounds = df.stat.approxQuantile(
            [c for c in cols], probs, 0.25 / n
        )
        for c, bounds in zip(cols, all_bounds):
            distinct = sorted(set(bounds))
            if not distinct:
                bucketed.append(F.lit(0).cast("long"))
                continue
            b = F.lit(0).cast("long")
            for bound in distinct:  # flat Add chain, codegen-friendly
                b = b + (F.col(c).cast("double") >= F.lit(bound)).cast("long")
            bucketed.append(F.least(b, F.lit(n - 1)))
    elif mode == "uniform":
        row = df.select(
            *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
        ).head()
        for c in cols:
            mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
            if mx <= mn:  # constant column: single bucket
                bucketed.append(F.lit(0).cast("long"))
                continue
            b = F.width_bucket(
                F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(n)
            )
            # width_bucket is 1-based and returns n+1 at the upper bound
            bucketed.append(F.least(b - 1, F.lit(n - 1)).cast("long"))
    else:
        raise ValueError(f"unknown zorder mode {mode!r}")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucketed):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(bucketed) + j))
    return z


def write_zorder(
    df: DataFrame,
    out_path: str,
    cols: list[str],
    n_files: int,
    bits: int = 6,
    mode: str = "quantile",
) -> None:
    """Write ``df`` Z-ordered on ``cols``: range-partition + sort by
    the interleaved Morton key so every file and row group covers a
    tight HYPER-RECTANGLE of the key space — selective predicates on
    ANY of the participating columns (not just the first, as with
    ``write_range_sorted``) skip row groups via parquet min/max stats.

    This is the multi-column companion to ``write_range_sorted``: one
    extra projection (the codegen'd interleave) on top of the same
    single repartitionByRange shuffle. The Z column itself is dropped
    before writing — the layout, not the schema, carries the order."""
    z = zorder_column(df, cols, bits=bits, mode=mode)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def shard_bucket_sql(md5_expr: str, n_shards: int) -> str:
    """SQL text for a UNIFORM shard bucket from an md5-hex expression —
    decode the first 4 hex chars to an integer in [0, 65536) and mod.
    Portable text: this form runs on BOTH Spark and DuckDB; oracle SQL
    strings use it. Spark call sites prefer ``shard_bucket_spark_sql``
    (same values, single digest reference — see below).

    The r1-r3 formula ``ascii(first hex char) % n`` was 3x-skewed:
    ascii codes of '0'-'9' (48-57) and 'a'-'f' (97-102) are not
    contiguous, so their residues mod 8 carry mass {2,3,2,2,2,2,2,1}/16
    (ADVICE r3). Proper per-char hex decode (ascii - 48, or - 87 for
    'a'-'f') yields 65536 equiprobable values: exactly uniform for any
    ``n_shards`` dividing 65536 and within 1/65536 otherwise."""
    return f"CAST({md5_uniform16_sql(md5_expr)} % {n_shards} AS INT)"


def md5_uniform16_spark_sql(md5_expr: str, start: int = 1) -> str:
    """Spark-side twin of ``md5_uniform16_sql``: ``conv(hex, 16, 10)``
    decodes the whole 4-hex-char slice in ONE expression reference
    where the portable CASE chain names the digest 8 times (2 per
    char). Codegen subexpression elimination absorbs some of that, but
    the single-call form still measured ~30% faster at sf0.1 on the
    stratified sampler (VERDICT r4 #4, SCALE.md). DuckDB has no
    ``conv``, so ORACLE strings keep ``md5_uniform16_sql``; the two
    forms are value-identical (pinned in tests/test_layout.py)."""
    return f"CAST(conv(substring({md5_expr}, {start}, 4), 16, 10) AS INT)"


def shard_bucket_spark_sql(md5_expr: str, n_shards: int) -> str:
    """Spark-side twin of ``shard_bucket_sql`` — identical buckets."""
    return f"CAST({md5_uniform16_spark_sql(md5_expr)} % {n_shards} AS INT)"


def md5_uniform16_sql(md5_expr: str, start: int = 1) -> str:
    """SQL text decoding 4 hex chars of an md5-hex expression (chars
    ``start``..``start+3``, 1-based) to a uniform integer in
    [0, 65536) — the shared primitive behind ``shard_bucket_sql`` (mod
    for buckets), the stratified sampler (threshold compare for keep
    rates), and the bloom screen (which slices TWO independent
    positions out of ONE digest — start=1 and start=5 — instead of
    hashing twice). Portable text (runs on both engines); used for
    ORACLE strings — Spark call sites use the value-identical
    ``md5_uniform16_spark_sql``."""
    def hv(i: int) -> str:
        a = f"ascii(substring({md5_expr}, {i}, 1))"
        return f"({a} - (CASE WHEN {a} >= 97 THEN 87 ELSE 48 END))"

    s = start
    return (
        f"((({hv(s)} * 16 + {hv(s + 1)}) * 16 + {hv(s + 2)}) * 16 + {hv(s + 3)})"
    )


def write_training_shards(
    docs: DataFrame,
    out_path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> None:
    """Materialize the deterministic training shuffle
    (queries/corpus_prep.py::training_shard_assignment) as a physical
    layout: md5-bucket shard column (uniform 4-hex-char decode,
    ``shard_bucket_sql``), one hash exchange keyed by shard, rows
    sorted by (md5, id) WITHIN each shard, written
    ``partitionBy(shard)`` so a trainer streams shard directories in a
    reproducible pseudo-random order. Content-keyed: identical files
    for identical input, any cluster size."""
    from pyspark.sql import functions as F

    h = F.md5(F.col(id_col).cast("string"))
    shard = F.expr(
        shard_bucket_spark_sql(f"md5(CAST({id_col} AS STRING))", n_shards)
    )
    (
        docs.withColumn("__h", h)
        .withColumn("shard", shard)
        .repartition("shard")
        .sortWithinPartitions("shard", "__h", id_col)
        .drop("__h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_path)
    )

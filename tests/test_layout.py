"""Layout operators: compaction file sizing and min/max skipping.

The skipping assertion reads actual parquet row-group statistics via
pyarrow: after write_range_sorted, the fraction of files whose
[min, max] intersects a selective range predicate must be small,
while the unsorted layout intersects nearly all files (values spread
everywhere) — the measurable fact Spark's row-group pruning runs on.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.layout import (
    compact_parquet,
    parquet_bytes,
    write_range_sorted,
)

SF = "/root/testdata/sf0.01"


def _file_ranges(path: str, col: str):
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        lo = min(meta.row_group(i).column(idx).statistics.min for i in range(meta.num_row_groups))
        hi = max(meta.row_group(i).column(idx).statistics.max for i in range(meta.num_row_groups))
        out.append((lo, hi))
    return out


def test_compact_parquet_hits_target_file_size(spark, tmp_path):
    # fragment the table into many tiny files first
    frag = str(tmp_path / "frag")
    load_table(spark, SF, "orders").repartition(64).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 64

    out = str(tmp_path / "compacted")
    target = max(1, parquet_bytes(frag) // 4)
    n = compact_parquet(spark, frag, out, target_file_bytes=target)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == n <= 6  # ceil(bytes/ (bytes/4)) with re-encoding slack
    # content preserved
    assert spark.read.parquet(out).count() == load_table(spark, SF, "orders").count()


def test_range_sorted_layout_enables_file_skipping(spark, tmp_path):
    ev = load_table(spark, SF, "events").withColumn(
        "value_d", F.col("value").cast("double")
    )
    unsorted = str(tmp_path / "unsorted")
    ev.repartition(16).write.parquet(unsorted)
    sorted_p = str(tmp_path / "sorted")
    write_range_sorted(ev, sorted_p, "value_d", n_files=16)

    lo, hi = ev.agg(F.min("value_d"), F.max("value_d")).head()
    a = lo + 0.45 * (hi - lo)
    b = lo + 0.55 * (hi - lo)  # selective 10%-of-keyspace range

    def overlap_frac(path):
        ranges = _file_ranges(path, "value_d")
        n_hit = sum(1 for flo, fhi in ranges if fhi >= a and flo <= b)
        return n_hit / len(ranges)

    assert overlap_frac(unsorted) >= 0.9  # every file spans ~everything
    assert overlap_frac(sorted_p) <= 0.25  # only the files owning the slice
    # rows answered identically from both layouts
    q = lambda p: (
        spark.read.parquet(p).where((F.col("value_d") >= a) & (F.col("value_d") <= b)).count()
    )
    assert q(unsorted) == q(sorted_p)


def test_training_shards_layout_and_order(spark, tmp_path):
    """write_training_shards: every shard directory exists, rows land
    in their md5 bucket, within-shard order equals the oracled
    training_shard_assignment positions, and the layout is identical
    under a different input partitioning."""
    import glob

    from tfm_semisup_spark.operators.layout import write_training_shards
    from tfm_semisup_spark.queries.corpus_prep import training_shard_assignment

    out = str(tmp_path / "shards")
    docs = load_table(spark, SF, "documents")
    write_training_shards(docs, out, n_shards=8)
    dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(dirs) == 8

    expected = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in training_shard_assignment(spark, SF).collect()
    }
    back = spark.read.parquet(out)
    for shard in range(8):
        ids = [
            r["doc_id"]
            for r in back.where(F.col("shard") == shard).collect()
        ]
        # parquet preserves within-file row order; single file per shard
        assert ids == sorted(ids, key=lambda d: expected[d][1])
        assert all(expected[d][0] == shard for d in ids)

    out2 = str(tmp_path / "shards2")
    write_training_shards(docs.repartition(7), out2, n_shards=8)
    a = spark.read.parquet(out).orderBy("shard", "doc_id").collect()
    b = spark.read.parquet(out2).orderBy("shard", "doc_id").collect()
    assert a == b


def test_shard_buckets_are_uniform(spark):
    """round 4 (ADVICE r3 medium): the r1-r3 raw-ascii formula carried
    3x shard skew (max/min mass ratio); the 4-hex-char decode must
    spread synthetic ids near-evenly. Also pin exact formula semantics:
    Spark and DuckDB evaluate the identical expression text to the
    identical buckets."""
    import duckdb

    from tfm_semisup_spark.operators.layout import shard_bucket_sql

    expr = shard_bucket_sql("md5(CAST(id AS STRING))", 8)
    n = 20_000
    counts = {
        r["shard"]: r["c"]
        for r in spark.range(n)
        .selectExpr(f"{expr} AS shard")
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert set(counts) == set(range(8))
    lo, hi = min(counts.values()), max(counts.values())
    assert hi / lo < 1.2, f"shard skew {hi}/{lo} (old formula: 3x)"

    duck = dict(
        duckdb.sql(
            f"SELECT {expr} AS shard, COUNT(*) AS c"
            " FROM range(20000) t(id) GROUP BY 1"
        ).fetchall()
    )
    assert duck == counts


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    from tfm_semisup_spark.operators.layout import write_zorder

    events = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zorder")
    events.repartition(16).write.parquet(plain)
    write_zorder(events, zord, ["user_id", "value"], n_files=16)

    # round-trip equality: layout rewrite, not a transformation
    a = sorted(r["event_id"] for r in spark.read.parquet(zord).collect())
    b = sorted(r["event_id"] for r in events.collect())
    assert a == b

    def hit_fraction(path, col, lo, hi):
        ranges = _file_ranges(path, col)
        return sum(1 for (mn, mx) in ranges if not (mx < lo or mn > hi)) / len(ranges)

    # a selective slab on EACH dimension must intersect far fewer
    # z-ordered files than round-robin files (which span everything).
    # With 16 files the file id is the top 4 z bits (u7 v7 u6 v6), so a
    # slab pinning the top two bucket bits of either dim hits ~4/16.
    u_lo, u_hi = 0, 9  # bottom ~7% of user ids -> u7=u6=0
    v = events.agg(
        F.expr("percentile(value, 0.05)"), F.expr("percentile(value, 0.15)")
    ).head()
    for col, lo, hi in [("user_id", u_lo, u_hi), ("value", v[0], v[1])]:
        f_plain = hit_fraction(plain, col, lo, hi)
        f_z = hit_fraction(zord, col, lo, hi)
        assert f_plain == 1.0, f"{col}: round-robin layout should span all files"
        assert f_z <= 0.5, f"{col}: z-order hit fraction {f_z} (plain {f_plain})"


def test_zorder_key_is_deterministic(spark):
    # uniform mode: the key is a pure function of the row values (the
    # quantile default is sample-dependent, like repartitionByRange)
    from tfm_semisup_spark.operators.layout import zorder_column

    events = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    z1 = {
        r["event_id"]: r["z"]
        for r in events.withColumn("z", zorder_column(events, ["user_id", "value"], mode="uniform"))
        .select("event_id", "z")
        .collect()
    }
    z2 = {
        r["event_id"]: r["z"]
        for r in events.repartition(13)
        .withColumn("z", zorder_column(events, ["user_id", "value"], mode="uniform"))
        .select("event_id", "z")
        .collect()
    }
    assert z1 == z2


def test_conv_decode_equals_case_chain_decode(spark):
    """The Spark-side conv() decode and the portable CASE-chain decode
    (oracle form) must agree on every value — including both hex
    alphabets in every position and non-start slices (bloom/CMS use
    start=5/9)."""
    from tfm_semisup_spark.operators.layout import (
        md5_uniform16_spark_sql,
        md5_uniform16_sql,
    )

    df = spark.range(20000).selectExpr("CAST(id AS STRING) AS s")
    checks = [
        (md5_uniform16_sql("md5(s)", start=st),
         md5_uniform16_spark_sql("md5(s)", start=st))
        for st in (1, 5, 9, 13, 29)
    ]
    agg = df.selectExpr(
        *[f"CASE WHEN ({a}) = ({b}) THEN 0 ELSE 1 END AS m{i}"
          for i, (a, b) in enumerate(checks)]
    ).groupBy().sum()
    assert all(v == 0 for v in agg.collect()[0])


def test_single_conv_h32_equals_two_slice_h32(spark):
    """The winnowing tier's single-digest 32-bit decode
    (conv of 8 hex chars) must equal the two-slice composition
    slice(1..4)·65536 + slice(5..8) on every value — the r14 hash
    projection relies on this identity."""
    from tfm_semisup_spark.queries.winnowing import _H32_ONE_SPARK, _H32_SPARK

    df = spark.range(20000).selectExpr("CAST(id AS STRING) AS sh")
    bad = df.selectExpr(
        f"CASE WHEN ({_H32_ONE_SPARK}) = CAST({_H32_SPARK} AS BIGINT)"
        " THEN 0 ELSE 1 END AS m"
    ).groupBy().sum().collect()[0][0]
    assert bad == 0

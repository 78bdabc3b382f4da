"""Scale utilities: bucketed zero-shuffle joins, salted skew joins,
IVF ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.bucketing import (
    bucketed_join,
    salted_join,
    write_bucketed_table,
)
from tfm_semisup_spark.operators.similarity import (
    build_ivf_index,
    ivf_top_k,
    with_feature_vectors,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    write_bucketed_table(orders, "b_orders", "o_custkey", num_buckets=8)
    write_bucketed_table(
        cust.withColumnRenamed("c_custkey", "cust_id"), "b_customer", "cust_id", 8
    )
    joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey", "cust_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout replaces the shuffle
    # and the result is correct
    expected = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    assert joined.count() == expected


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF, "orders")
    nation_cust = load_table(spark, SF, "customer").select("c_custkey", "c_nationkey")
    plain = orders.join(nation_cust, orders.o_custkey == nation_cust.c_custkey)
    salted = salted_join(orders, nation_cust, "o_custkey", "c_custkey", num_salts=4)
    assert salted.count() == plain.count()
    p = plain.groupBy("c_nationkey").count()
    s = salted.groupBy("c_nationkey").count()
    assert sorted(map(tuple, p.collect())) == sorted(map(tuple, s.collect()))


def test_ivf_topk_recall_vs_exact(spark):
    emb = with_feature_vectors(load_table(spark, SF, "embeddings"))
    model, bucketed = build_ivf_index(emb, num_centroids=8)
    bucketed = bucketed.cache()
    q = emb.where(F.col("vec_id") == 0).head()["features"]

    got = {r["vec_id"] for r in ivf_top_k(model, bucketed.where(F.col("vec_id") != 0), q, k=10, n_probe=3).collect()}
    assert len(got) == 10

    # exact top-10 by euclidean for recall measurement
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col("features"))
    q_lit = F.array(*[F.lit(float(v)) for v in q.toArray()])
    dist = F.sqrt(
        F.aggregate(F.zip_with(arr, q_lit, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda a, v: a + v)
    )
    exact = {
        r["vec_id"]
        for r in emb.where(F.col("vec_id") != 0)
        .select("vec_id", dist.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    recall = len(got & exact) / 10
    assert recall >= 0.5  # 3/8 of the corpus probed; typically much higher


def test_ivf_index_partitioned_write_prunes(spark, tmp_path):
    """IVF index persisted partitioned by centroid bucket: probing reads
    only the probed buckets' files (directory-level pruning — at 100 TB
    the probe never touches the other buckets' data)."""
    emb = with_feature_vectors(load_table(spark, SF, "embeddings"))
    model, bucketed = build_ivf_index(emb, num_centroids=8)
    path = str(tmp_path / "ivf_index")
    bucketed.select("vec_id", "embedding", "ivf_bucket").write.partitionBy(
        "ivf_bucket"
    ).parquet(path)

    back = spark.read.parquet(path)
    probe = [0, 3]
    files = {
        r["f"]
        for r in back.where(F.col("ivf_bucket").isin(probe))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert files
    assert all(("ivf_bucket=0" in f) or ("ivf_bucket=3" in f) for f in files)

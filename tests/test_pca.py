"""Distributed PCA fit: numpy parity, partitioning independence (the
integer-moment determinism claim), and the sign convention."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tfm_semisup_spark.io import embedding_dim, load_table
from tfm_semisup_spark.operators.pca import fit_pca

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_matches_numpy_reference(emb):
    dim = embedding_dim(SF)
    comps, vals, ratio, n = fit_pca(emb, "embedding", dim, k=5)
    x = np.stack([r["embedding"] for r in emb.collect()]).astype(np.float64)
    assert n == len(x)
    cov = np.cov(x, rowvar=False, bias=True)
    ref = np.sort(np.linalg.eigvalsh(cov))[::-1][:5]
    # quantization error is ~1e-6 relative on unit-scale inputs
    assert np.allclose(vals, ref, rtol=1e-4, atol=1e-6)
    assert np.all(np.diff(vals) <= 1e-12)  # descending
    assert abs(ratio.sum() - (ref.sum() / np.trace(cov))) < 1e-3
    # components are orthonormal
    g = comps @ comps.T
    assert np.allclose(g, np.eye(5), atol=1e-8)
    # sign convention: largest-|.| coordinate positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_partitioning_independent(emb):
    dim = embedding_dim(SF)
    a = fit_pca(emb, "embedding", dim, k=4)
    b = fit_pca(emb.repartition(13), "embedding", dim, k=4)
    c = fit_pca(emb.coalesce(1), "embedding", dim, k=4)
    for other in (b, c):
        assert np.array_equal(a[1], other[1])  # eigenvalues BIT-equal
        assert np.array_equal(a[0], other[0])  # components bit-equal


def test_spectrum_query_deterministic(spark):
    from tfm_semisup_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    r1 = sorted(map(tuple, QUERIES["embedding_pca_spectrum"](spark, SF).collect()))
    r2 = sorted(map(tuple, QUERIES["embedding_pca_spectrum"](spark, SF).collect()))
    assert r1 == r2
    assert len(r1) == 8


def test_covariance_slice_matches_numpy(spark):
    """The oracled embedding_covariance_slice (exact covar_pop of dims
    1-8) must equal the numpy population covariance — the same matrix
    fit_pca accumulates via quantized moments, here checked exactly."""
    import numpy as np

    from tfm_semisup_spark.queries.relational4 import embedding_covariance_slice

    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet").select("embedding").collect()
    )
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)[:, :8]
    C = np.cov(X.T, bias=True)
    got = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in embedding_covariance_slice(spark, SF).collect()
    }
    assert len(got) == 36
    for i in range(8):
        for j in range(i, 8):
            assert abs(got[(i + 1, j + 1)] - C[i, j]) < 5e-6, (i, j)

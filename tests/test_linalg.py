"""Distributed Gram/covariance and PCA whitening vs numpy references."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from helix_db_spark.operators.linalg import (apply_whitening,
                                             fit_pca_whitener, gram_cells,
                                             gram_matrix)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _np_embeddings(spark):
    rows = spark.read.parquet(EMB).select("embedding").collect()
    return np.asarray([np.asarray(r.embedding, dtype=np.float64)
                       for r in rows])


def test_gram_cells_match_numpy(spark):
    df = spark.read.parquet(EMB)
    x = _np_embeddings(spark)
    pairs = [(0, 0), (0, 1), (5, 10), (63, 63)]
    got = {(r.i, r.j): r.gram for r in
           gram_cells(df, "embedding", pairs).collect()}
    for i, j in pairs:
        assert got[(i, j)] == pytest.approx(
            float(x[:, i] @ x[:, j]), rel=1e-12)
    # centered = covariance
    gotc = {(r.i, r.j): r.gram for r in
            gram_cells(df, "embedding", pairs, centered=True).collect()}
    c = np.cov(x, rowvar=False, bias=True)
    for i, j in pairs:
        assert gotc[(i, j)] == pytest.approx(float(c[i, j]), rel=1e-9)


def test_gram_cells_stay_jvm_side(spark):
    df = spark.read.parquet(EMB)
    out = gram_cells(df, "embedding", [(0, 1)], centered=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan   # the cells path is pure built-ins


def test_gram_matrix_matches_numpy(spark):
    df = spark.read.parquet(EMB)
    x = _np_embeddings(spark)
    d = x.shape[1]
    rows = gram_matrix(df, "embedding", d).collect()
    g = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for r in rows:
        g[r.idx // d, r.idx % d] = r.val
        if r.idx < d:
            s[r.idx] = r.sums
        if r.idx == 0:
            n = r.n
    assert n == len(x)
    assert np.allclose(g, x.T @ x, rtol=1e-10)
    assert np.allclose(s, x.sum(axis=0), rtol=1e-10)


def test_pca_whitener_deterministic_and_whitening(spark):
    df = spark.read.parquet(EMB)
    x = _np_embeddings(spark)
    m1 = fit_pca_whitener(df, "embedding", d=64, k=8)
    m2 = fit_pca_whitener(df, "embedding", d=64, k=8)
    assert m1 == m2                       # bit-identical refit
    # sign convention: each component's largest-|entry| is positive
    for comp in m1.components:
        a = np.asarray(comp)
        assert a[int(np.argmax(np.abs(a)))] > 0
    # eigenvalues descend and match numpy's
    w = np.linalg.eigvalsh(np.cov(x, rowvar=False, bias=True))[::-1]
    assert np.allclose(m1.eigenvalues, w[:8], rtol=1e-8)

    out = apply_whitening(df, "embedding", m1)
    y = np.asarray([r.whitened for r in out.select("whitened").collect()])
    assert y.shape == (len(x), 8)
    # whitened coordinates: zero mean, unit variance, uncorrelated
    assert np.allclose(y.mean(axis=0), 0.0, atol=1e-9)
    cov = np.cov(y, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(8), atol=1e-5)


def test_apply_whitening_plan_is_jvm_only(spark):
    df = spark.read.parquet(EMB)
    model = fit_pca_whitener(df, "embedding", d=64, k=4)
    out = apply_whitening(df, "embedding", model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan   # projection is zip_with folds


def test_fit_requires_two_rows(spark):
    one = spark.createDataFrame([([1.0, 2.0],)], "embedding array<double>")
    with pytest.raises(ValueError, match=">= 2 vectors"):
        fit_pca_whitener(one, "embedding", d=2, k=1)

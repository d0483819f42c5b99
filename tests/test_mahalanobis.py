"""mahalanobis_fit/scores: numpy parity, anomaly detection sanity,
partition-invariant fit, null handling, validation."""
import numpy as np
import pytest
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.embeddings import (
    mahalanobis_fit, mahalanobis_scores)


def _vecs(n=300, d=4, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.normal(0, 1, (d, d))
    cov = A @ A.T + np.eye(d)
    return rng.multivariate_normal(np.arange(d, dtype=float), cov, n)


def _df(spark, X, extra=()):
    rows = [Row(vec_id=i, embedding=[float(v) for v in x])
            for i, x in enumerate(X)]
    rows += [Row(vec_id=len(X) + j, embedding=e)
             for j, e in enumerate(extra)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_matches_numpy(spark):
    X = _vecs()
    model = mahalanobis_fit(_df(spark, X), "embedding")
    got = {r.vec_id: r.maha for r in
           mahalanobis_scores(_df(spark, X), model).collect()}
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    lam = 1e-6 * np.trace(np.round(cov, 12)) / X.shape[1]
    inv = np.linalg.inv(np.round(cov, 12) + lam * np.eye(X.shape[1]))
    inv = (inv + inv.T) / 2
    exp = np.sqrt(np.einsum("ij,jk,ik->i", X - np.round(mu, 12), inv,
                            X - np.round(mu, 12)))
    # mirror computes cov the two-pass way vs the operator's sums way:
    # both round at 12 dp but can differ in the final digit, and the
    # inverse amplifies — compare at 1e-6 relative
    for i in range(len(X)):
        assert abs(got[i] - exp[i]) < 1e-6 * max(1.0, exp[i]), i


def test_flags_planted_outlier(spark):
    X = _vecs(500)
    outlier = [100.0, -100.0, 100.0, -100.0]
    df = _df(spark, X, extra=[outlier])
    model = mahalanobis_fit(df, "embedding")
    scored = mahalanobis_scores(df, model).collect()
    top = max(scored, key=lambda r: r.maha)
    assert top.vec_id == 500  # the planted point dominates
    inliers = [r.maha for r in scored if r.vec_id != 500]
    assert top.maha > 10 * max(inliers) / 4  # far outside the cloud


def test_fit_partition_invariant(spark):
    X = _vecs(200)
    a = mahalanobis_fit(_df(spark, X).repartition(1), "embedding")
    b = mahalanobis_fit(_df(spark, X).repartition(17), "embedding")
    assert np.array_equal(a.mean, b.mean)
    assert np.array_equal(a.inv_cov, b.inv_cov)


def test_null_vectors_score_null(spark):
    X = _vecs(50)
    df = _df(spark, X, extra=[None])
    model = mahalanobis_fit(df.where("embedding is not null"),
                            "embedding")
    rows = {r.vec_id: r.maha for r in
            mahalanobis_scores(df, model).collect()}
    assert rows[50] is None
    assert all(v is not None for k, v in rows.items() if k != 50)


def test_validation(spark):
    with pytest.raises(ValueError, match="empty"):
        mahalanobis_fit(
            _df(spark, np.zeros((0, 4))).where("vec_id < 0"), "embedding")
    with pytest.raises(ValueError, match="n >= 2"):
        mahalanobis_fit(_df(spark, np.ones((1, 3))), "embedding")

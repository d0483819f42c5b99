"""Partition-order determinism pins for the quantized (``scale``-set)
embedding operators — the round-4 `covariance_embeddings` driver red row
was a `round(distributed float sum, 6)` contract flipping at rounding
midpoints between partitionings/engines.  These tests rerun each
operator under two very different physical layouts (1 input partition /
2 shuffle partitions vs 13 input partitions / 37 shuffle partitions)
and require BIT-IDENTICAL results, on data salted with values that sit
exactly on quantization midpoints."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.embeddings import (
    centroid_distance_features,
    covariance_matrix,
    embedding_moments,
    embedding_norms,
    label_centroids,
)

D = 8
N = 120


def _make_df(spark):
    rng = np.random.default_rng(20260817)
    rows = []
    for i in range(N):
        vec = rng.standard_normal(D) * 0.3
        # salt with exact decimal-midpoint values — the class that
        # flips round(x, 6) contracts
        if i % 3 == 0:
            vec[i % D] = (i - N // 2 + 0.5) / 1e6
        if i % 7 == 0:
            vec[(i + 1) % D] = 0.1234565
        rows.append((i, [float(np.float32(v)) for v in vec], i % 4))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def _two_layouts(spark, build):
    """Run ``build(df)`` under two opposite physical layouts and return
    both sorted collections."""
    df = _make_df(spark)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = build(df.coalesce(1))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        b = build(df.repartition(13))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return a, b


def _rows(df, *key):
    return [tuple(r) for r in df.orderBy(*key).collect()]


def test_covariance_bit_identical_across_layouts(spark):
    a, b = _two_layouts(
        spark, lambda df: _rows(covariance_matrix(df, scale=6), "i", "j"))
    assert a == b  # exact, including the float64 cov column
    assert len(a) == D * (D + 1) // 2


def test_covariance_matches_numpy_reference(spark):
    df = _make_df(spark)
    got = {(r.i, r.j): r.cov
           for r in covariance_matrix(df, scale=6).collect()}
    M = np.array([r.embedding for r in df.orderBy("vec_id").collect()],
                 dtype=np.float64)
    Q = np.floor(M * 1e6 + 0.5)
    ref = np.cov(Q, rowvar=False, ddof=1) / 1e12
    for (i, j), cov in got.items():
        assert cov == pytest.approx(ref[i - 1, j - 1], rel=1e-9, abs=1e-15)


def test_moments_and_centroids_bit_identical(spark):
    a, b = _two_layouts(
        spark, lambda df: _rows(embedding_moments(df, scale=6), "pos"))
    assert a == b and len(a) == D
    a, b = _two_layouts(
        spark,
        lambda df: _rows(label_centroids(df, scale=6), "label", "pos"))
    assert a == b and len(a) == 4 * D
    # mean_q really is the half-up-rounded integer of the exact mean
    # (in 1e-6 units); mean is the same statistic divided out
    df = _make_df(spark)
    for r in label_centroids(df, scale=6).collect():
        assert abs(r.mean_q - r.mean * 1e6) <= 0.5 + 1e-6


def test_norms_and_distances_bit_identical(spark):
    a, b = _two_layouts(
        spark,
        lambda df: _rows(embedding_norms(df, scale=6), "vec_id"))
    assert a == b and len(a) == N

    def dist(df):
        cents = label_centroids(df, scale=6)
        return _rows(
            centroid_distance_features(df, cents, scale=6)
            .select("vec_id", "label", "dist_own", "nearest_label",
                    "dist_nearest"),
            "vec_id")

    a, b = _two_layouts(spark, dist)
    assert a == b and len(a) == N
    # own-label distance exists for every row (every label has a centroid)
    assert all(r[2] is not None for r in a)


def test_quantized_norm_close_to_float_norm(spark):
    df = _make_df(spark)
    q = {r.vec_id: r.l2_norm
         for r in embedding_norms(df, scale=6).collect()}
    f = {r.vec_id: r.l2_norm for r in embedding_norms(df).collect()}
    for k in f:
        assert q[k] == pytest.approx(f[k], abs=1e-5)


def test_covariance_overflow_guard_raises(spark):
    # |q| ~ 0.5 * 10^9 = 5e8 -> q^2 = 2.5e17; 40 rows -> 1e19 > 2^62
    rows = [(i, [0.5] * 4) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="overflow int64"):
        covariance_matrix(df.coalesce(1), scale=9).collect()


def test_covariance_ragged_guard_still_raises_with_scale(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.1, 0.2, 0.3])],
        "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="ragged"):
        covariance_matrix(df.coalesce(1), scale=6).collect()

"""Greedy k-center selection: pure-numpy greedy parity, 2-approx
coverage property, and partition invariance."""
import numpy as np
import pytest
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.similarity import (
    k_center_select)


def _vecs(n, d=6, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randn(n, d).astype(np.float32)


def _greedy_python(X, k, scale=6):
    q = np.floor(X.astype(np.float64) * 10**scale + 0.5).astype(np.int64)
    sel = [(0, 0, None)]          # seed = smallest id = 0
    chosen = [0]
    for r in range(1, k):
        d = np.min(
            [((q - q[c]) ** 2).sum(axis=1) for c in chosen], axis=0)
        d[chosen] = -1            # excluded from the argmax
        best = int(np.where(d == d.max())[0].min())  # id-asc tiebreak
        sel.append((r, best, int(d[best])))
        chosen.append(best)
    return sel


def test_k_center_matches_numpy_greedy(spark):
    X = _vecs(40)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in X[i]])
         for i in range(len(X))])
    got = [(r.sel_round, r.vec_id, r.dmin_q)
           for r in k_center_select(df, k=7).orderBy("sel_round")
           .collect()]
    assert got == _greedy_python(X, 7)


def test_k_center_coverage_radius_decreases_and_covers(spark):
    X = _vecs(60, seed=9)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in X[i]])
         for i in range(len(X))])
    rows = k_center_select(df, k=6).orderBy("sel_round").collect()
    radii = [r.dmin_q for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))  # monotone
    # every point within the final radius of some center (the greedy
    # invariant: radius after k picks = max dmin at pick k)
    q = np.floor(X.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    centers = [r.vec_id for r in rows]
    cover = np.min(
        [((q - q[c]) ** 2).sum(axis=1) for c in centers], axis=0)
    assert cover.max() <= radii[-1]


def test_k_center_partitioning_invariant_and_null_safe(spark):
    X = _vecs(30, seed=5)
    rows = [Row(vec_id=i, embedding=[float(v) for v in X[i]])
            for i in range(len(X))] + [Row(vec_id=99, embedding=None)]
    a = spark.createDataFrame(rows).repartition(1)
    b = spark.createDataFrame(rows).repartition(16)
    ga = [(r.sel_round, r.vec_id, r.dmin_q)
          for r in k_center_select(a, k=5).orderBy("sel_round").collect()]
    gb = [(r.sel_round, r.vec_id, r.dmin_q)
          for r in k_center_select(b, k=5).orderBy("sel_round").collect()]
    assert ga == gb
    assert all(i != 99 for _, i, _ in ga)  # null vector never selected


def test_k_center_rejects_bad_k(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[1.0])])
    with pytest.raises(ValueError):
        k_center_select(df, k=0)

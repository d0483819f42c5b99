"""poisson_bootstrap_ci: exact python-mirror parity (same md5 draws),
Poisson(1) weight distribution, CI sanity, partition invariance,
grouped variant."""
import hashlib
import math

import numpy as np
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.experiment import (
    poisson1_thresholds, poisson_bootstrap_ci)


def _draw(key, seed, r):
    h = hashlib.md5(f"{key}:{seed}:{r}".encode()).hexdigest()
    return int(h[:15], 16)


def _mirror(rows, n_reps=50, seed=42, scale=6, alpha=0.05, out_scale=6):
    """Pure-python recomputation of the operator's contract."""
    ts = poisson1_thresholds()
    ys = {k: math.floor(v * 10.0 ** scale + 0.5) for k, v in rows}
    means = []
    for r in range(n_reps):
        ws = wy = 0
        for k, yq in ys.items():
            u = _draw(k, seed, r)
            w = sum(1 for t in ts if u >= t)
            ws += w
            wy += w * yq
        if ws > 0:
            means.append(wy / ws / 10.0 ** scale)
    means.sort()
    m = len(means)
    lo = means[int(math.floor(alpha / 2 * (m - 1)))]
    hi = means[int(math.ceil((1 - alpha / 2) * (m - 1)))]
    sy = sum(ys.values())
    q = lambda v: math.floor(v * 10.0 ** out_scale + 0.5)
    return (len(ys), q(sy / len(ys) / 10.0 ** scale), q(lo), q(hi), m)


def test_thresholds_are_poisson1_cdf():
    ts = poisson1_thresholds()
    assert len(ts) == 12 and ts == sorted(ts)
    # CDF(0) = e^-1, CDF(1) = 2e^-1
    assert abs(ts[0] / 2 ** 60 - math.exp(-1)) < 1e-12
    assert abs(ts[1] / 2 ** 60 - 2 * math.exp(-1)) < 1e-12
    # truncation mass above k_max=12 is ~1e-9 of the 60-bit grid
    assert 0 < 2 ** 60 - ts[-1] < 2 ** 60 * 1e-8


def test_exact_python_mirror_parity(spark):
    rng = np.random.RandomState(11)
    rows = [(i, float(v)) for i, v in
            enumerate(rng.normal(10.0, 2.0, 300))]
    df = spark.createDataFrame([Row(id=k, v=v) for k, v in rows],
                               "id long, v double")
    got = poisson_bootstrap_ci(df, "v", "id", n_reps=20, seed=7).collect()
    exp = _mirror(rows, n_reps=20, seed=7)
    r = got[0]
    assert (r.n, r.mean_u, r.lo_u, r.hi_u, r.n_reps_valid) == exp


def test_ci_brackets_mean_and_shrinks(spark):
    rng = np.random.RandomState(5)
    rows = [Row(id=i, v=float(v))
            for i, v in enumerate(rng.normal(50.0, 5.0, 2000))]
    df = spark.createDataFrame(rows, "id long, v double")
    r = poisson_bootstrap_ci(df, "v", "id", n_reps=50).collect()[0]
    assert r.lo_u <= r.mean_u <= r.hi_u
    # CI half-width should be in the ~2·σ/√n ballpark (not 10× off)
    half = (r.hi_u - r.lo_u) / 2 / 1e6
    se = 5.0 / math.sqrt(2000)
    assert 0.3 * se < half < 4 * se
    assert r.n_reps_valid == 50


def test_partition_invariance(spark):
    rows = [Row(id=i, v=float(i % 17)) for i in range(500)]
    a = poisson_bootstrap_ci(
        spark.createDataFrame(rows).repartition(1), "v", "id",
        n_reps=25).collect()[0]
    b = poisson_bootstrap_ci(
        spark.createDataFrame(rows).repartition(11), "v", "id",
        n_reps=25).collect()[0]
    assert a == b  # exact equality, not allclose


def test_grouped(spark):
    rng = np.random.RandomState(2)
    rows = [Row(g="a" if i % 2 else "b", id=i,
                v=float(rng.uniform(0, 1) + (i % 2)))
            for i in range(800)]
    out = {r.g: r for r in poisson_bootstrap_ci(
        spark.createDataFrame(rows), "v", "id", group_by="g",
        n_reps=30).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].n == out["b"].n == 400
    # group a's metric is ~1 higher than group b's
    assert out["a"].mean_u - out["b"].mean_u > 800_000
    assert out["a"].lo_u > out["b"].hi_u  # separated CIs


def test_diff_ci_detects_real_effect_and_nulls_fake(spark):
    from msi_preprocessing_pipeline_spark.operators.experiment import (
        poisson_bootstrap_diff_ci)
    rng = np.random.RandomState(9)
    rows = []
    for i in range(1500):
        arm = "t" if i % 2 else "c"
        lift = 1.0 if arm == "t" else 0.0
        rows.append(Row(id=i, g=arm, v=float(rng.normal(10 + lift, 2.0))))
    df = spark.createDataFrame(rows, "id long, g string, v double")
    r = poisson_bootstrap_diff_ci(df, "v", "id", "g", "c", "t",
                                  n_reps=40, seed=3).collect()[0]
    assert r.n_c == 750 and r.n_t == 750 and r.n_reps_valid == 40
    assert r.lo_u <= r.diff_u <= r.hi_u
    assert r.lo_u > 0  # true lift=1: CI excludes 0
    assert 500_000 < r.diff_u < 1_500_000
    # no-effect arms: CI must straddle 0
    rows0 = [Row(id=i, g="t" if i % 2 else "c",
                 v=float(rng.normal(10, 2.0))) for i in range(1500)]
    df0 = spark.createDataFrame(rows0, "id long, g string, v double")
    r0 = poisson_bootstrap_diff_ci(df0, "v", "id", "g", "c", "t",
                                   n_reps=40, seed=3).collect()[0]
    assert r0.lo_u < 0 < r0.hi_u


def test_diff_ci_partition_invariance(spark):
    from msi_preprocessing_pipeline_spark.operators.experiment import (
        poisson_bootstrap_diff_ci)
    rows = [Row(id=i, g="t" if i % 3 == 0 else "c", v=float(i % 23))
            for i in range(600)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    a = poisson_bootstrap_diff_ci(df.repartition(1), "v", "id", "g",
                                  "c", "t", n_reps=20).collect()
    b = poisson_bootstrap_diff_ci(df.repartition(13), "v", "id", "g",
                                  "c", "t", n_reps=20).collect()
    assert a == b

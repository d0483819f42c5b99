"""conformal_qhat / conformal_coverage: textbook rank correctness,
coverage guarantee on exchangeable data, tiny-n honest null, partition
invariance."""
import math

import numpy as np
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.experiment import (
    conformal_coverage, conformal_qhat)


def _df(spark, scores):
    return spark.createDataFrame(
        [Row(s=float(v)) for v in scores], "s double")


def test_rank_and_qhat_match_textbook(spark):
    # scores 1..100: n=100, alpha=0.1 -> rank = ceil(101*0.9) = 91
    scores = list(range(1, 101))
    r = conformal_qhat(_df(spark, scores), "s", alpha=0.1).collect()[0]
    assert (r.n_cal, r.rank_r) == (100, 91)
    assert r.qhat_u == 91_000_000  # the 91st smallest, quantized 1e6
    # duplicates: the running count jumps past the rank inside a tie
    dup = [5.0] * 50 + [7.0] * 50
    r2 = conformal_qhat(_df(spark, dup), "s", alpha=0.1).collect()[0]
    assert r2.qhat_u == 7_000_000  # rank 91 lands in the 7.0 block


def test_tiny_calibration_returns_null(spark):
    # n=3, alpha=0.1: rank = ceil(4*0.9) = 4 > n -> no certifiable qhat
    r = conformal_qhat(_df(spark, [1, 2, 3]), "s", alpha=0.1).collect()[0]
    assert (r.n_cal, r.rank_r, r.qhat_u) == (3, 4, None)


def test_coverage_guarantee_on_exchangeable_data(spark):
    rng = np.random.RandomState(0)
    all_scores = np.abs(rng.normal(0, 1, 4000))
    cal, test = all_scores[:2000], all_scores[2000:]
    qh = conformal_qhat(_df(spark, cal), "s", alpha=0.1)
    cov = conformal_coverage(_df(spark, test), "s", qh).collect()[0]
    assert cov.n_test == 2000
    frac = cov.n_covered / cov.n_test
    # marginal guarantee: >= 1 - alpha in expectation; allow sampling slack
    assert frac > 0.87
    assert frac < 0.95  # and not vacuously 100%


def test_partition_invariance(spark):
    rng = np.random.RandomState(3)
    scores = rng.uniform(0, 10, 500)
    a = conformal_qhat(_df(spark, scores).repartition(1), "s").collect()
    b = conformal_qhat(_df(spark, scores).repartition(13), "s").collect()
    assert a == b


def test_empty_calibration(spark):
    r = conformal_qhat(
        _df(spark, []).where("s is not null"), "s").collect()[0]
    assert r.n_cal == 0 and r.qhat_u is None

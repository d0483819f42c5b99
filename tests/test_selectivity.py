"""selectivity_profile: GMM estimate vs exact counts, partition
invariance, distinct-cap fail-fast, empty input."""
import numpy as np
import pytest
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.profile import (
    selectivity_profile)


def _df(spark, vals):
    return spark.createDataFrame([Row(v=float(x)) for x in vals],
                                 "v double")


def test_estimates_track_exact_counts_on_bimodal(spark):
    rng = np.random.RandomState(1)
    vals = np.concatenate([rng.normal(20, 3, 3000),
                           rng.normal(80, 5, 1000)])
    out = {r.pred_id: r for r in selectivity_profile(
        _df(spark, vals), "v",
        [(10, 30), (70, 90), (0, 100), (45, 55)], scale=2).collect()}
    # the whole domain: both exact
    assert out[2].actual_rows == 4000
    assert abs(out[2].est_rows - 4000) <= 10
    # each mode: model within 2% of truth
    for i in (0, 1):
        a = out[i].actual_rows
        assert abs(out[i].est_rows - a) <= max(20, 0.02 * a), i
    # the inter-mode valley: both tiny
    assert out[3].actual_rows < 20 and out[3].est_rows < 40


def test_partition_invariance_exact(spark):
    rng = np.random.RandomState(5)
    vals = rng.uniform(0, 100, 2000)
    a = selectivity_profile(_df(spark, vals).repartition(1), "v",
                            [(0, 40), (40, 100)], scale=2).collect()
    b = selectivity_profile(_df(spark, vals).repartition(17), "v",
                            [(0, 40), (40, 100)], scale=2).collect()
    assert a == b  # exact row equality: histogram + EM both invariant


def test_distinct_cap_fail_fast(spark):
    vals = np.arange(500, dtype=float)
    with pytest.raises(ValueError, match="coarsen scale"):
        selectivity_profile(_df(spark, vals), "v", [(0, 10)],
                            scale=6, max_distinct=100)


def test_empty_and_validation(spark):
    out = selectivity_profile(
        _df(spark, []).where("v is not null"), "v", [(0, 1)]).collect()
    assert out[0].est_rows == 0 and out[0].actual_rows == 0
    with pytest.raises(ValueError, match="no predicates"):
        selectivity_profile(_df(spark, [1.0]), "v", [])

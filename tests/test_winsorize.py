"""winsorize: exact-percentile clipping, grouped + global, null safety."""
import numpy as np
import pytest
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.encoding import winsorize


def test_winsorize_matches_numpy(spark):
    vals = [float(v) for v in range(101)] + [1e9, -1e9]
    df = spark.createDataFrame([Row(id=i, v=v) for i, v in enumerate(vals)])
    got = {r["id"]: r["v_clip"] for r in
           winsorize(df, "v", 0.05, 0.95, out_col="v_clip").collect()}
    lo, hi = np.percentile(vals, [5, 95], method="linear")
    want = np.clip(vals, lo, hi)
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(w)


def test_winsorize_grouped_null_group_and_null_values(spark):
    df = spark.createDataFrame(
        [Row(id=i, g="a", v=float(i)) for i in range(10)]
        + [Row(id=100, g=None, v=5.0), Row(id=101, g=None, v=50.0),
           Row(id=102, g="a", v=None)])
    out = {r["id"]: r["v_winsor"] for r in
           winsorize(df, "v", 0.25, 0.75, group_cols=["g"]).collect()}
    assert out[102] is None                  # null value stays null
    assert 100 in out and 101 in out        # null group not dropped
    assert out[100] == pytest.approx(np.clip(
        5.0, *np.percentile([5.0, 50.0], [25, 75])))
    # group 'a' rows clipped by its own quartiles
    lo, hi = np.percentile(range(10), [25, 75])
    assert out[0] == pytest.approx(lo) and out[9] == pytest.approx(hi)


def test_winsorize_single_row_group_noop(spark):
    df = spark.createDataFrame([Row(id=1, g="x", v=7.0)])
    assert winsorize(df, "v", 0.01, 0.99, group_cols=["g"]) \
        .collect()[0]["v_winsor"] == 7.0


def test_winsorize_validates_quantiles(spark):
    df = spark.createDataFrame([Row(v=1.0)])
    with pytest.raises(ValueError, match="lo_q"):
        winsorize(df, "v", 0.9, 0.1)

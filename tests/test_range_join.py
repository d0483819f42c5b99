"""Bucketized range join: equivalence vs the naive theta-join, plan shape."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.joins import range_join


@pytest.fixture(scope="module")
def sides(spark):
    import numpy as np
    rng = np.random.RandomState(11)
    pts = pd.DataFrame({"pid": range(300),
                        "x": rng.uniform(-50, 150, size=300).round(3)})
    lo = rng.uniform(-60, 140, size=40).round(3)
    ivs = pd.DataFrame({"iid": range(40), "lo": lo,
                        "hi": (lo + rng.uniform(0.1, 30, size=40)).round(3)})
    return (spark.createDataFrame(pts), spark.createDataFrame(ivs))


def test_range_join_matches_theta_join(sides):
    pts, ivs = sides
    got = range_join(pts, ivs, "x", "lo", "hi", bucket_width=7.0) \
        .select("pid", "iid").toPandas()
    naive = (pts.crossJoin(ivs)
             .where(F.col("x").between(F.col("lo"), F.col("hi")))
             .select("pid", "iid").toPandas())
    key = lambda d: set(zip(d.pid, d.iid))  # noqa: E731
    assert key(got) == key(naive) and len(got) == len(naive)


def test_range_join_left_keeps_unmatched(sides):
    pts, ivs = sides
    left = range_join(pts, ivs, "x", "lo", "hi", bucket_width=7.0,
                      how="left").toPandas()
    matched_pids = set(left[left.iid.notna()].pid)
    all_pids = set(left.pid)
    assert all_pids == set(range(300))  # every point survives
    inner = range_join(pts, ivs, "x", "lo", "hi", 7.0).toPandas()
    assert matched_pids == set(inner.pid)


def test_range_join_plan_is_equi_join(sides):
    import contextlib
    import io
    pts, ivs = sides
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join(pts, ivs, "x", "lo", "hi", 7.0).explain("simple")
    plan = buf.getvalue()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_rejects_column_collision(sides):
    pts, ivs = sides
    with pytest.raises(ValueError):
        range_join(pts, ivs.withColumnRenamed("iid", "pid"),
                   "x", "lo", "hi", 7.0)


def test_range_join_wide_interval_broadcast_path(sides, spark):
    """One interval spanning ~10⁶ bucket-widths must complete via the
    broadcast branch (no million-element explode array) and stay exact."""
    pts, ivs = sides
    wide = spark.createDataFrame(
        pd.DataFrame({"iid": [1000, 1001],
                      "lo": [-4.0e6, -30.0], "hi": [3.0e6, 40.0]}))
    ivs2 = ivs.unionByName(wide)
    got = range_join(pts, ivs2, "x", "lo", "hi", bucket_width=7.0,
                     wide_buckets=64).select("pid", "iid").toPandas()
    naive = (pts.crossJoin(ivs2)
             .where(F.col("x").between(F.col("lo"), F.col("hi")))
             .select("pid", "iid").toPandas())
    key = lambda d: sorted(zip(d.pid, d.iid))  # noqa: E731
    assert key(got) == key(naive)
    # left join stays bag-correct with the wide branch present
    left = range_join(pts, ivs2, "x", "lo", "hi", 7.0, how="left",
                      wide_buckets=64).toPandas()
    assert sorted(left[left.iid.notna()].pipe(
        lambda d: zip(d.pid, d.iid))) == key(naive)
    # the catch-all interval matches EVERY point: null rows only for... none
    assert left.iid.isna().sum() == 0
    # and points outside every narrow interval still appear (matched wide)
    assert set(left.pid) == set(range(300))


def test_range_join_too_many_wide_intervals_fails_fast(sides, spark):
    pts, ivs = sides
    wide = spark.createDataFrame(
        pd.DataFrame({"iid": [1000, 1001, 1002],
                      "lo": [-4.0e6] * 3, "hi": [3.0e6] * 3}))
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(pts, ivs.unionByName(wide), "x", "lo", "hi", 7.0,
                   wide_buckets=64, max_wide=2)

"""Unit tests for operators.cv (temporal folds, purged splits,
negative sampling)."""
import datetime as dt
import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.cv import (
    negative_samples, purged_train_test, time_folds)

BASE = dt.datetime(2024, 1, 1)


def _ev_df(spark, n=20):
    return spark.createDataFrame(
        [Row(event_id=i, ts=BASE + dt.timedelta(hours=i)) for i in range(n)],
        "event_id long, ts timestamp")


def test_time_folds_equal_frequency_and_order(spark):
    df = _ev_df(spark, 20)
    out = {r.event_id: r.fold for r in
           time_folds(df, "ts", n_folds=4).collect()}
    # folds are contiguous in time and equal-count
    assert [out[i] for i in range(20)] == sorted(out[i] for i in range(20))
    counts = {f: sum(1 for v in out.values() if v == f) for f in range(4)}
    assert counts == {0: 5, 1: 5, 2: 5, 3: 5}


def test_time_folds_ties_share_fold_and_null_ts(spark):
    rows = [Row(event_id=i, ts=BASE) for i in range(10)]
    rows.append(Row(event_id=99, ts=None))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r.event_id: r.fold for r in
           time_folds(df, "ts", n_folds=3).collect()}
    assert len({out[i] for i in range(10)}) == 1  # identical ts, one fold
    assert out[99] is None


def test_time_folds_validates(spark):
    with pytest.raises(ValueError):
        time_folds(_ev_df(spark), "ts", n_folds=1)


def test_purged_split_embargo_flags(spark):
    df = time_folds(_ev_df(spark, 20), "ts", n_folds=4)
    out = {r.event_id: r for r in purged_train_test(
        df, test_fold=1, ts_col="ts", embargo_s=3600 * 1.5).collect()}
    # fold 1 = hours 5..9; embargo 1.5h catches hours 4 and 10 (and only
    # them: hour 3 is 2h before the window, hour 11 is 2h after)
    for i in range(20):
        r = out[i]
        assert r.is_test == (5 <= i <= 9), i
        assert r.in_embargo == (i in (4, 10)), i
        assert r.is_train == (not r.is_test and not r.in_embargo), i


def test_purged_split_empty_test_fold(spark):
    df = time_folds(_ev_df(spark, 8), "ts", n_folds=4)
    out = purged_train_test(df, test_fold=9, embargo_s=1e6).collect()
    assert all((not r.is_test) and (not r.in_embargo) and r.is_train
               for r in out)


def _neg_setup(spark):
    pos = spark.createDataFrame(
        [Row(u=1, it=10), Row(u=1, it=11), Row(u=2, it=10)],
        "u long, it long")
    items = spark.createDataFrame(
        [Row(it=i) for i in (10, 11, 12, 13, 14)], "it long")
    return pos, items


def test_negative_samples_deterministic_and_manual_hash(spark):
    pos, items = _neg_setup(spark)
    a = sorted(map(tuple, negative_samples(
        pos, items, "u", "it", k=2, seed=5).collect()))
    b = sorted(map(tuple, negative_samples(
        pos, items, "u", "it", k=2, seed=5).collect()))
    assert a == b and len(a) > 0
    # manual check of one draw: user 2, item 10, slot 0
    h = int(hashlib.md5(b"2:10:0:5").hexdigest()[:8], 16) % 5
    expected_item = sorted([10, 11, 12, 13, 14])[h]
    manual = [t for t in a if t[0] == 2 and t[1] == 10 and t[2] == 0]
    if expected_item == 10:  # collides with the true positive -> dropped
        assert manual == []
    else:
        assert manual == [(2, 10, 0, expected_item)]


def test_negative_samples_never_emit_positives(spark):
    pos, items = _neg_setup(spark)
    out = negative_samples(pos, items, "u", "it", k=4, seed=0).collect()
    positives = {(1, 10), (1, 11), (2, 10)}
    assert all((r.u, r.neg_item) not in positives for r in out)
    assert len(out) <= 3 * 4


def test_negative_samples_validates(spark):
    pos, items = _neg_setup(spark)
    with pytest.raises(ValueError):
        negative_samples(pos, items, "u", "it", k=0)


def test_negative_samples_null_catalog_items_dropped(spark):
    pos = spark.createDataFrame([Row(u=1, it=10)], "u long, it long")
    items = spark.createDataFrame(
        [Row(it=i) for i in (10, 11, 12, None, 13, 14)], "it long")
    out = negative_samples(pos, items, "u", "it", k=3, seed=5)
    rows = out.collect()
    assert all(r.neg_item is not None for r in rows)
    # index space must match the null-free catalog exactly
    cat = sorted([10, 11, 12, 13, 14])
    for r in rows:
        h = int(hashlib.md5(f"1:10:{r.slot}:5".encode())
                .hexdigest()[:8], 16) % 5
        assert r.neg_item == cat[h]


def test_purged_split_null_ts_flags(spark):
    rows = [Row(event_id=i, ts=BASE + dt.timedelta(hours=i))
            for i in range(8)] + [Row(event_id=99, ts=None)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    from msi_preprocessing_pipeline_spark.operators.cv import time_folds
    folded = time_folds(df, "ts", n_folds=4)
    out = {r.event_id: r for r in purged_train_test(
        folded, test_fold=1, embargo_s=0).collect()}
    r = out[99]
    assert r.fold is None
    assert r.is_test is None and r.is_train is None
    assert r.in_embargo is None  # test fold nonempty -> null, not False
    # empty test fold: (null AND false) = false for in_embargo
    out2 = {r.event_id: r for r in purged_train_test(
        folded, test_fold=9, embargo_s=0).collect()}
    assert out2[99].in_embargo is False
    assert out2[99].is_train is None

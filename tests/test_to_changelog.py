"""to_changelog: minimal delta emission and the CDC round-trip
identity apply_changelog(old, to_changelog(old, new)) == new."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.changelog import (
    apply_changelog, to_changelog)


def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, ts=t) for k, v, t in rows],
        "k int, v string, ts long")


def test_minimal_delta(spark):
    old = _snap(spark, [(1, "a", 10), (2, "b", 10), (3, "c", 10)])
    new = _snap(spark, [(1, "a", 10), (2, "B", 20), (4, "d", 20)])
    got = {(r["k"]): (r["op"], r["v"], r["ts"])
           for r in to_changelog(old, new, "k", "ts", 99).collect()}
    # k=1 unchanged -> absent; k=2 changed -> upsert NEW value;
    # k=3 removed -> delete carrying OLD row; k=4 added -> upsert
    assert got == {2: ("u", "B", 99), 3: ("d", "c", 99),
                   4: ("u", "d", 99)}


def test_round_trip_identity(spark):
    old = _snap(spark, [(i, f"v{i % 7}", i % 5) for i in range(200)])
    new = _snap(spark, [(i, f"v{(i * 3) % 7}", (i % 5))
                        for i in range(30, 230)])
    log = to_changelog(old, new, "k", "ts", 1000)
    replayed = apply_changelog(old, log, "k", "ts")
    a = sorted(map(tuple, replayed.collect()))
    b = sorted(map(tuple, new.collect()))
    # ts differs for changed rows (stamped 1000) — compare key+value
    a_kv = sorted((r[0], r[1]) for r in a)
    b_kv = sorted((r[0], r[1]) for r in b)
    assert a_kv == b_kv
    assert len(a) == len(b)


def test_null_safe_value_compare(spark):
    old = _snap(spark, [(1, None, 10), (2, "x", 10)])
    new = _snap(spark, [(1, None, 10), (2, None, 10)])
    got = {r["k"]: r["op"]
           for r in to_changelog(old, new, "k", "ts", 50).collect()}
    assert got == {2: "u"}  # null==null unchanged; x->null is a change


def test_missing_column_raises(spark):
    old = _snap(spark, [(1, "a", 10)]).drop("v")
    new = _snap(spark, [(1, "a", 10)])
    with pytest.raises(ValueError, match="missing columns"):
        to_changelog(old, new, "k", "ts", 1)


def test_ts_value_column_expression(spark):
    old = _snap(spark, [(1, "a", 10)])
    new = _snap(spark, [(1, "b", 10)])
    got = to_changelog(old, new, "k", "ts",
                       F.lit(7) + F.lit(3)).collect()
    assert got[0]["ts"] == 10 and got[0]["op"] == "u"

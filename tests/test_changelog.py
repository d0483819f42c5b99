"""CDC changelog application (operators/changelog.py)."""

from msi_preprocessing_pipeline_spark.operators.changelog import (
    apply_changelog)


def test_apply_changelog_upsert_delete_insert(spark):
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")],
        "k long, ts long, v string")
    changes = spark.createDataFrame(
        [(1, 20, "a2", "u"),   # update k=1
         (2, 20, None, "d"),   # delete k=2
         (4, 20, "d1", "u"),   # insert k=4
         (3, 5, "stale", "u")],  # stale update: older than base -> ignored
        "k long, ts long, v string, op string")
    out = {r["k"]: r["v"]
           for r in apply_changelog(base, changes, "k", "ts").collect()}
    assert out == {1: "a2", 3: "c", 4: "d1"}


def test_apply_changelog_change_wins_timestamp_tie(spark):
    base = spark.createDataFrame([(1, 10, "base")], "k long, ts long, v string")
    changes = spark.createDataFrame([(1, 10, "change", "u")],
                                    "k long, ts long, v string, op string")
    out = apply_changelog(base, changes, "k", "ts").collect()
    assert out[0]["v"] == "change"  # __src desc: change beats base at ties


def test_apply_changelog_last_of_many_changes_wins(spark):
    base = spark.createDataFrame([(1, 0, "base", 0)],
                                 "k long, ts long, v string, seq long")
    changes = spark.createDataFrame(
        [(1, 10, "first", 1, "u"), (1, 10, "second", 2, "u"),
         (1, 10, "gone", 3, "d"), (1, 10, "final", 4, "u")],
        "k long, ts long, v string, seq long, op string")
    out = apply_changelog(base, changes, "k", "ts",
                          tiebreak=["seq"]).collect()
    assert len(out) == 1 and out[0]["v"] == "final"

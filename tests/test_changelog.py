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


def test_apply_changelog_replay_and_order_invariant(spark):
    """Applying the same changelog twice, or in shuffled partition order,
    yields the identical snapshot (deterministic CDC)."""
    import numpy as np
    rng = np.random.RandomState(77)
    base_rows = [(int(k), 0, f"b{k}", 0) for k in range(30)]
    ch_rows = [(int(rng.randint(0, 40)), int(rng.randint(1, 50)),
                f"v{i}", i, "u" if rng.rand() < 0.8 else "d")
               for i in range(200)]
    base = spark.createDataFrame(base_rows, "k long, ts long, v string, seq long")
    ch = spark.createDataFrame(ch_rows,
                               "k long, ts long, v string, seq long, op string")
    snap = lambda c: sorted(  # noqa: E731
        (r["k"], r["v"]) for r in
        apply_changelog(base, c, "k", "ts", tiebreak=["seq"]).collect())
    a = snap(ch)
    b = snap(ch.repartition(17))
    assert a == b
    # idempotent re-apply: applying the changelog onto the result with no
    # newer changes keeps every surviving row
    first = apply_changelog(base, ch, "k", "ts", tiebreak=["seq"])
    again = sorted((r["k"], r["v"]) for r in
                   apply_changelog(first, ch, "k", "ts",
                                   tiebreak=["seq"]).collect())
    assert again == a


def test_apply_changelog_rejects_unknown_op(spark):
    import pytest
    from py4j.protocol import Py4JJavaError  # noqa: F401

    base = spark.createDataFrame([(1, 10, "a")], "k long, ts long, v string")
    changes = spark.createDataFrame([(1, 20, "b", "UPSERT")],
                                    "k long, ts long, v string, op string")
    with pytest.raises(Exception, match="op must be"):
        apply_changelog(base, changes, "k", "ts").collect()

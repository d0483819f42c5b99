"""preference_pairs: exact pair set vs a python mirror, degenerate
small groups, margin filter, and single-Exchange plan pin."""
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.ranking import (
    preference_pairs)


def _df(spark):
    rows = [
        # group a: 6 items, clear spread
        Row(g="a", i=1, s=10), Row(g="a", i=2, s=8), Row(g="a", i=3, s=8),
        Row(g="a", i=4, s=3), Row(g="a", i=5, s=1), Row(g="a", i=6, s=1),
        # group b: 2 items -> only one valid ordered pair
        Row(g="b", i=7, s=5), Row(g="b", i=8, s=2),
        # group c: singleton -> no pairs;  null score dropped
        Row(g="c", i=9, s=4), Row(g="c", i=10, s=None),
    ]
    return spark.createDataFrame(rows, "g string, i int, s int")


def _mirror(rows, k=2, margin=1):
    from collections import defaultdict
    by_g = defaultdict(list)
    for g, i, s in rows:
        if s is not None:
            by_g[g].append((i, s))
    out = set()
    for g, items in by_g.items():
        top = sorted(items, key=lambda x: (-x[1], x[0]))[:k]
        bot = sorted(items, key=lambda x: (x[1], -x[0]))[:k]
        for ci, cs in top:
            for ri, rs in bot:
                if ci != ri and cs - rs >= margin:
                    out.add((g, ci, ri, cs, rs, cs - rs))
    return out


def test_pairs_match_mirror(spark):
    df = _df(spark)
    rows = [(r["g"], r["i"], r["s"]) for r in df.collect()]
    got = {tuple(r) for r in
           preference_pairs(df, "g", "i", "s", k=2).collect()}
    assert got == _mirror(rows, k=2)
    # tie handling is deterministic: top-2 of group a is items 1, 2
    assert ("a", 2, 5, 8, 1, 7) in got
    assert not any(p[1] == 3 for p in got if p[0] == "a")


def test_margin_filter(spark):
    df = _df(spark)
    got = preference_pairs(df, "g", "i", "s", k=2, min_margin=4)
    assert all(r["margin"] >= 4 for r in got.collect())
    rows = [(r["g"], r["i"], r["s"]) for r in df.collect()]
    assert {tuple(r) for r in got.collect()} == _mirror(rows, 2, 4)


def test_small_groups(spark):
    df = _df(spark)
    got = preference_pairs(df, "g", "i", "s", k=3).collect()
    assert [(r["chosen_id"], r["rejected_id"])
            for r in got if r["g"] == "b"] == [(7, 8)]
    assert not [r for r in got if r["g"] == "c"]


def test_single_exchange_plan(spark):
    df = _df(spark)
    plan = preference_pairs(df, "g", "i", "s", k=2) \
        ._jdf.queryExecution().executedPlan().toString()
    # the two rank windows share the group-key Exchange; the self-join
    # adds its own — no more than 3 total, none a cartesian
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

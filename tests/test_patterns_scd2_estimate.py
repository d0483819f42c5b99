"""event_pattern_count, scd2_intervals, join_size_estimate,
json_key_profile vs brute force."""

import random
import re
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.changelog import (
    scd2_intervals)
from msi_preprocessing_pipeline_spark.operators.profile import (
    join_size_estimate)
from msi_preprocessing_pipeline_spark.operators.sequences import (
    event_pattern_count)
from msi_preprocessing_pipeline_spark.operators.validate import (
    json_key_profile)

MAP = {"view": "V", "click": "C", "purchase": "P"}


def test_event_pattern_count_matches_re(spark):
    rng = random.Random(5)
    types = ["view", "click", "purchase", "error", None]
    rows = [(rng.randint(1, 10), i, rng.choice(types))
            for i in range(500)]
    rows += [(None, 1, "view"), (3, None, "click")]
    df = spark.createDataFrame(rows, "u long, seq long, et string")
    pattern = "VC*P"
    exp = {}
    by_u = {}
    for u, seq, et in rows:
        if u is None or seq is None:
            continue
        by_u.setdefault(u, []).append((seq, MAP.get(et, "_")))
    for u, evs in by_u.items():
        s = "".join(ch for _, ch in sorted(evs))
        exp[u] = (len(evs), len(re.findall(pattern, s)))
    got = {r["u"]: (r["n_events"], r["n_matches"])
           for r in event_pattern_count(
               df, "u", ["seq"], "et", MAP, pattern).collect()}
    assert got == exp


def test_event_pattern_count_guard_and_validation(spark):
    rows = [(1, i, "view") for i in range(30)] + [(2, 0, "view")]
    df = spark.createDataFrame(rows, "u long, seq long, et string")
    got = event_pattern_count(df, "u", ["seq"], "et", MAP, "V",
                              max_events=10).collect()
    assert [r["u"] for r in got] == [2]  # entity 1 dropped by the cap
    with pytest.raises(ValueError):
        event_pattern_count(df, "u", ["seq"], "et", {"view": "__"}, "V")
    with pytest.raises(ValueError):
        event_pattern_count(df, "u", ["seq"], "et", {"view": "_"}, "V")
    with pytest.raises(ValueError):
        event_pattern_count(df, "u", ["seq"], "et", MAP, "V",
                            max_events=0)


def test_scd2_intervals(spark):
    rows = [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
            (2, 15, "x"), (3, None, "dropped")]
    df = spark.createDataFrame(rows, "k long, ts long, v string")
    got = {(r["k"], r["ts"]): (r["eff_from"], r["eff_to"],
                               r["is_current"])
           for r in scd2_intervals(df, ["k"], "ts",
                                   tiebreak_cols=["v"]).collect()}
    assert got == {(1, 10): (10, 20, False), (1, 20): (20, 30, False),
                   (1, 30): (30, None, True), (2, 15): (15, None, True)}


def test_join_size_estimate_exact(spark):
    rng = random.Random(2)
    lrows = [(rng.randint(1, 6),) for _ in range(80)] + [(None,)] * 3
    rrows = [(rng.randint(4, 9),) for _ in range(60)] + [(None,)] * 2
    left = spark.createDataFrame(lrows, "k long")
    right = spark.createDataFrame(rrows, "k long")
    cl, cr = {}, {}
    for (k,) in lrows:
        if k is not None:
            cl[k] = cl.get(k, 0) + 1
    for (k,) in rrows:
        if k is not None:
            cr[k] = cr.get(k, 0) + 1
    matched = set(cl) & set(cr)
    est = sum(cl[k] * cr[k] for k in matched)
    mx = max((cl[k] * cr[k] for k in matched), default=0)
    row = join_size_estimate(left, right, "k", "k").collect()[0]
    assert row["n_left"] == len(lrows)
    assert row["n_right"] == len(rrows)
    assert row["n_left_keys"] == len(cl)
    assert row["n_right_keys"] == len(cr)
    assert row["n_matched_keys"] == len(matched)
    assert row["est_rows"] == Decimal(est)
    assert row["max_key_rows"] == Decimal(mx)
    assert row["top_key_share"] == pytest.approx(mx / est)
    # true join size agrees
    assert left.join(right, ["k"]).count() == est


def test_join_size_estimate_no_match(spark):
    left = spark.createDataFrame([(1,)], "k long")
    right = spark.createDataFrame([(2,)], "k long")
    row = join_size_estimate(left, right, "k", "k").collect()[0]
    assert (row["n_matched_keys"], row["est_rows"]) == (0, Decimal(0))
    assert row["top_key_share"] is None


def test_json_key_profile(spark):
    rows = [('{"a": 1, "b": "x"}',), ('{"a": 2.5, "b": "x"}',),
            ('{"a": true, "c": null}',), (None,), ("not json",),
            ('{"a": -7}',)]
    df = spark.createDataFrame(rows, "j string")
    got = {r["key"]: (r["n_present"], r["n_null_value"], r["n_intlike"],
                      r["n_floatlike"], r["n_boollike"], r["n_distinct"])
           for r in json_key_profile(df, "j").collect()}
    assert got == {"a": (4, 0, 2, 1, 1, 4),
                   "b": (2, 0, 0, 0, 0, 1),
                   "c": (1, 1, 0, 0, 0, 0)}

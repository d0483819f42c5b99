"""Funnel / cohort / interval-coverage operators vs brute force."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.behavior import (
    cohort_activity, funnel_report, funnel_times, interval_coverage)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(ms):
    return EPOCH + dt.timedelta(milliseconds=ms)


def _brute_funnel(events, steps, within_ms=None):
    """events: list of (user, ms, type) with nulls allowed."""
    out = {}
    by_user = {}
    for u, ms, et in events:
        if u is None or ms is None or et is None:
            continue
        by_user.setdefault(u, []).append((ms, et))
    for u, evs in by_user.items():
        t = []
        prev = None
        for i, s in enumerate(steps):
            cand = [ms for ms, et in evs if et == s
                    and (i == 0 or (prev is not None and ms > prev))
                    and (within_ms is None or i == 0
                         or (t[0] is not None and ms <= t[0] + within_ms))]
            cur = min(cand) if cand and (i == 0 or prev is not None) else None
            t.append(cur)
            prev = cur
        if t[0] is not None:
            out[u] = t
    return out


def test_funnel_times_matches_brute_force(spark):
    rng = random.Random(23)
    types = ["view", "click", "purchase", "error"]
    events = [(rng.randint(1, 12), rng.randint(0, 10_000) * 1000,
               rng.choice(types)) for _ in range(400)]
    events += [(None, 1000, "view"), (1, None, "view"), (2, 5000, None)]
    df = spark.createDataFrame(
        [(u, _ts(ms) if ms is not None else None, et)
         for u, ms, et in events], "u long, ts timestamp, et string")
    for within in (None, 3_600_000):
        exp = _brute_funnel(events, ["view", "click", "purchase"], within)
        got = {r["u"]: [r["t_1"], r["t_2"], r["t_3"]]
               for r in funnel_times(df, "u", "ts", "et",
                                     ["view", "click", "purchase"],
                                     within_ms=within).collect()}
        assert set(got) == set(exp)
        for u in exp:
            want = [None if m is None else _ts(m) for m in exp[u]]
            assert got[u] == want, (u, within, got[u], want)


def test_funnel_repeated_step_needs_two_events(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "click"), (1, _ts(5), "click"), (2, _ts(0), "click")],
        "u long, ts timestamp, et string")
    got = {r["u"]: (r["t_1"], r["t_2"])
           for r in funnel_times(df, "u", "ts", "et",
                                 ["click", "click"]).collect()}
    assert got[1] == (_ts(0), _ts(5))
    assert got[2] == (_ts(0), None)


def test_funnel_report_counts_and_ratios(spark):
    rows = [(1, _ts(0), "view"), (1, _ts(1), "click"),
            (2, _ts(0), "view"), (2, _ts(1), "click"), (2, _ts(2), "buy"),
            (3, _ts(0), "view"),
            (4, _ts(0), "click")]  # never starts the funnel
    df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
    rep = {r["step"]: r for r in funnel_report(
        df, "u", "ts", "et", ["view", "click", "buy"]).collect()}
    assert [rep[i]["n_entities"] for i in (1, 2, 3)] == [3, 2, 1]
    assert rep[1]["conv_from_prev"] is None
    assert rep[1]["conv_from_first"] is None
    assert rep[2]["conv_from_prev"] == pytest.approx(2 / 3)
    assert rep[3]["conv_from_prev"] == pytest.approx(1 / 2)
    assert rep[3]["conv_from_first"] == pytest.approx(1 / 3)
    with pytest.raises(ValueError):
        funnel_times(df, "u", "ts", "et", [])
    with pytest.raises(ValueError):
        funnel_times(df, "u", "ts", "et", ["view"], within_ms=0)


def test_cohort_activity_matches_brute_force(spark):
    rng = random.Random(7)
    events = [(rng.randint(1, 30), rng.randint(0, 90) * 86_400_000)
              for _ in range(500)] + [(None, 0), (1, None)]
    df = spark.createDataFrame(
        [(u, _ts(ms) if ms is not None else None) for u, ms in events],
        "u long, ts timestamp")
    # brute force (weeks start Monday; 2024-01-01 IS a Monday)
    first = {}
    active = set()
    for u, ms in events:
        if u is None or ms is None:
            continue
        wk = (ms // 86_400_000) // 7  # Monday-aligned because of EPOCH
        first[u] = min(first.get(u, wk), wk)
        active.add((u, wk))
    cells = {}
    for u, wk in active:
        key = (first[u], wk - first[u])
        cells[key] = cells.get(key, 0) + 1
    got = {(int((r["cohort_period"] - EPOCH).days // 7),
            r["period_offset"]): (r["n_active"], r["cohort_size"],
                                  r["retention"])
           for r in cohort_activity(df, "u", "ts", "week").collect()}
    assert set(got) == set(cells)
    for key, n in cells.items():
        size = cells[(key[0], 0)]
        assert got[key] == (n, size, pytest.approx(n / size))
    with pytest.raises(ValueError):
        cohort_activity(df, "u", "ts", "fortnight")


def test_interval_coverage_matches_brute_force(spark):
    rng = random.Random(11)
    rows = []
    for _ in range(600):
        k = rng.randint(1, 8)
        s = rng.randint(0, 1000)
        rows.append((k, s, s + rng.randint(0, 50)))
    rows += [(1, 5, 5), (2, None, 10), (None, 0, 10), (3, 10, None),
             (4, 20, 10)]  # zero-length kept; nulls/inverted dropped
    df = spark.createDataFrame(rows, "k long, s long, e long")
    exp = {}
    for k in {r[0] for r in rows if r[0] is not None}:
        iv = sorted((s, e) for kk, s, e in rows
                    if kk == k and s is not None and e is not None and e >= s)
        if not iv:
            continue
        comps, cov, hi = 0, 0, None
        for s, e in iv:
            if hi is None or s > hi:
                comps += 1
                cov += e - s
                hi = e
            elif e > hi:
                cov += e - hi
                hi = e
        exp[k] = (len(iv), comps, cov)
    got = {r["k"]: (r["n_intervals"], r["n_components"], r["covered"])
           for r in interval_coverage(df, "k", "s", "e").collect()}
    assert got == exp


def test_interval_coverage_single_shuffle_plan(spark):
    df = spark.createDataFrame([(1, 0, 10)], "k long, s long, e long")
    plan = interval_coverage(df, "k", "s", "e")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1, plan

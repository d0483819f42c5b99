"""search_topk (inverted-index TF-IDF retrieval) and check_pit
(temporal-leakage audit)."""

import math

import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.lm import search_topk
from msi_preprocessing_pipeline_spark.operators.validate import check_pit


def _score_py(docs, query):
    n = len(docs)
    qtf = {}
    for t in query:
        qtf[t] = qtf.get(t, 0) + 1
    dfreq = {}
    for toks in docs.values():
        for t in set(toks) & set(qtf):
            dfreq[t] = dfreq.get(t, 0) + 1
    out = {}
    for i, toks in docs.items():
        s = 0
        for t, q in qtf.items():
            tf = toks.count(t)
            if tf and t in dfreq:
                idf = math.floor(
                    math.log((n + 1) / (dfreq[t] + 1) + 1.0) * 1e9 + 0.5)
                s += q * tf * idf
        if s:
            out[i] = s
    return out


def test_search_topk_matches_python_reference(spark):
    docs = {1: [5, 5, 7], 2: [5], 3: [7, 7, 7, 9], 4: [9], 5: [1, 2]}
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, tokens array<int>")
    query = [5, 7, 7, 100]  # 100 absent from the corpus
    exp = _score_py(docs, query)
    got = [(r["doc_id"], r["score_nano"])
           for r in search_topk(df, query, k=10).collect()]
    # ordering: score desc, id asc; only matching docs appear
    exp_order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == exp_order
    # k truncates deterministically
    got2 = [(r["doc_id"], r["score_nano"])
            for r in search_topk(df, query, k=2).collect()]
    assert got2 == exp_order[:2]


def test_search_topk_validates_args(spark):
    df = spark.createDataFrame([(1, [1])], "doc_id long, tokens array<int>")
    with pytest.raises(ValueError):
        search_topk(df, [1], k=0)
    with pytest.raises(ValueError):
        search_topk(df, [])


def test_search_topk_uses_partial_topk_not_global_sort(spark):
    df = spark.createDataFrame([(1, [1, 2])], "doc_id long, tokens array<int>")
    plan = (search_topk(df, [1, 2], k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def _bm25_py(docs, query, k1=(6, 5), b=(3, 4)):
    """Exact-integer reference: Fraction-free because the saturation
    numerator/denominator are cleared integers and // truncates."""
    n = len(docs)
    tt = sum(len(t) for t in docs.values())
    qtf = {}
    for t in query:
        qtf[t] = qtf.get(t, 0) + 1
    dfreq = {}
    for toks in docs.values():
        for t in set(toks) & set(qtf):
            dfreq[t] = dfreq.get(t, 0) + 1
    k1n, k1d = k1
    bn, bd = b
    out = {}
    for i, toks in docs.items():
        s = 0
        for t, q in qtf.items():
            tf = toks.count(t)
            if tf and t in dfreq:
                idf = math.floor(
                    math.log((n + 1) / (dfreq[t] + 1) + 1.0) * 1e9 + 0.5)
                num = (k1n + k1d) * bd * tt * tf * 1_000_000
                den = (k1d * bd * tt * tf + k1n * (bd - bn) * tt
                       + k1n * bn * len(toks) * n)
                s += q * idf * (num // den)
        if s:
            out[i] = s
    return out


def test_bm25_topk_matches_python_reference(spark):
    from msi_preprocessing_pipeline_spark.operators.lm import bm25_topk

    docs = {1: [5, 5, 7], 2: [5], 3: [7, 7, 7, 9], 4: [9], 5: [1, 2],
            6: [5] * 12 + [3] * 20}  # long doc: length norm bites
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, tokens array<int>")
    query = [5, 7, 7, 100]  # 100 absent from the corpus
    exp = _bm25_py(docs, query)
    exp_order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [(r["doc_id"], r["score_q"])
           for r in bm25_topk(df, query, k=10).collect()]
    assert got == exp_order
    # partition-layout invariance: exact integers are associative
    got7 = [(r["doc_id"], r["score_q"])
            for r in bm25_topk(df.repartition(7), query, k=10).collect()]
    assert got7 == exp_order
    # k truncates deterministically
    got2 = [(r["doc_id"], r["score_q"])
            for r in bm25_topk(df, query, k=2).collect()]
    assert got2 == exp_order[:2]


def test_bm25_saturation_bounds_repeat_tf(spark):
    """tf saturation: 12 copies of the term score < (k1+1)x one copy
    at equal lengths, unlike the linear tf of search_topk."""
    from msi_preprocessing_pipeline_spark.operators.lm import bm25_topk

    docs = {1: [5] + [0] * 11, 2: [5] * 12}
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, tokens array<int>")
    got = {r["doc_id"]: r["score_q"]
           for r in bm25_topk(df, [5], k=10).collect()}
    assert got[2] > got[1]                      # more tf still helps
    assert got[2] < got[1] * (1 + 6 / 5) + 1    # but saturates under k1+1
    exp = _bm25_py(docs, [5])
    assert got == exp


def test_bm25_validates_args_and_plan(spark):
    from msi_preprocessing_pipeline_spark.operators.lm import bm25_topk

    df = spark.createDataFrame([(1, [1, 2])], "doc_id long, tokens array<int>")
    with pytest.raises(ValueError):
        bm25_topk(df, [1], k=0)
    with pytest.raises(ValueError):
        bm25_topk(df, [])
    with pytest.raises(ValueError):
        bm25_topk(df, [1], b=(5, 4))  # b > 1
    plan = (bm25_topk(df, [1, 2], k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_check_pit_counts_violations_and_lags(spark):
    rows = [
        # (label_ts, f1, f2): f1 leaks on row 2; f2 never matched on row 3
        (100, 90, 100),
        (100, 150, 40),
        (200, 180, None),
    ]
    df = spark.createDataFrame(rows, "label_ms long, f1 long, f2 long")
    got = {r["feature_col"]: r
           for r in check_pit(df, "label_ms", ["f1", "f2"]).collect()}
    assert got["f1"]["n_rows"] == 3
    assert got["f1"]["n_violations"] == 1
    assert got["f1"]["max_leak"] == 50
    assert got["f1"]["max_lag"] == 20
    assert got["f2"]["n_violations"] == 0
    assert got["f2"]["max_leak"] is None
    assert got["f2"]["max_lag"] == 60


def test_check_pit_empty_relation_zero_not_null(spark):
    df = spark.createDataFrame([], "label_ms long, f1 long")
    r = check_pit(df, "label_ms", "f1").collect()[0]
    assert (r["n_rows"], r["n_violations"]) == (0, 0)
    assert r["max_leak"] is None and r["max_lag"] is None
    with pytest.raises(ValueError):
        check_pit(df, "label_ms", [])


def test_check_pit_passes_on_engine_asof_output(spark):
    """The engine's own as-of join must audit clean (structural
    leakage-freedom re-established by the runtime audit)."""
    from msi_preprocessing_pipeline_spark.operators.asof import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    labels = (ev.where(F.col("event_type") == "purchase")
              .select("event_id",
                      F.unix_millis(F.col("ts").cast("timestamp"))
                      .alias("ms"), "user_id"))
    feats = (ev.where(F.col("event_type") == "click")
             .select("user_id",
                     F.unix_millis(F.col("ts").cast("timestamp"))
                     .alias("fms"), "value"))
    j = asof_join(labels, feats, on="user_id", left_ts="ms",
                  right_ts="fms", value_cols=["value"],
                  matched_ts_col="fms")
    r = check_pit(j, "ms", "fms").collect()[0]
    assert r["n_violations"] == 0 and r["n_rows"] == labels.count()


def test_ks_stat_matches_brute_force(spark):
    """Exact D vs a numpy two-sample KS over several random pairs."""
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.drift import ks_stat

    rng = np.random.RandomState(9)
    for trial in range(3):
        a = np.round(rng.normal(0, 1, 300), 2)
        b = np.round(rng.normal(0.3 * trial, 1.2, 200), 2)
        ra = spark.createDataFrame([(float(v),) for v in a], "value double")
        rb = spark.createDataFrame([(float(v),) for v in b], "value double")
        r = ks_stat(ra, rb, "value").collect()[0]
        assert (r["n_ref"], r["n_cur"]) == (300, 200)
        pooled = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
        exp = np.abs(fa - fb).max()
        assert r["d"] == pytest.approx(exp, abs=1e-12), trial


def test_ks_stat_identical_and_empty_sides(spark):
    from msi_preprocessing_pipeline_spark.operators.drift import ks_stat

    df = spark.createDataFrame([(1.0,), (2.0,), (None,)], "value double")
    r = ks_stat(df, df, "value").collect()[0]
    assert (r["n_ref"], r["n_cur"], r["d"]) == (2, 2, 0.0)
    empty = spark.createDataFrame([], "value double")
    r2 = ks_stat(df, empty, "value").collect()[0]
    assert (r2["n_ref"], r2["n_cur"], r2["d"]) == (2, 0, None)


def test_k_anonymity_groups_and_report(spark):
    from msi_preprocessing_pipeline_spark.operators.privacy import (
        k_anonymity_groups, k_anonymity_report)

    rows = [("a", 1), ("a", 1), ("a", 1), ("b", 2), ("b", 2),
            ("c", None), ("c", None), ("d", 9)]
    df = spark.createDataFrame(rows, "seg string, zip int")
    g = {(r["seg"], r["zip"]): (r["n_rows"], r["is_violation"])
         for r in k_anonymity_groups(df, ["seg", "zip"], k=3).collect()}
    assert g[("a", 1)] == (3, False)
    assert g[("b", 2)] == (2, True)
    assert g[("c", None)] == (2, True)  # null QI groups as a value
    assert g[("d", 9)] == (1, True)
    r = k_anonymity_report(df, ["seg", "zip"], k=3).collect()[0]
    assert (r["n_rows"], r["n_groups"]) == (8, 4)
    assert (r["n_violating_groups"], r["n_violating_rows"]) == (3, 5)
    assert (r["min_group"], r["is_k_anonymous"]) == (1, False)
    ok = k_anonymity_report(df, ["seg", "zip"], k=1 + 1).collect()[0]
    assert ok["is_k_anonymous"] is False  # d is still a singleton
    import pytest as _pt
    with _pt.raises(ValueError):
        k_anonymity_report(df, [], 3)
    with _pt.raises(ValueError):
        k_anonymity_report(df, ["seg"], 1)


def test_k_anonymity_empty_relation(spark):
    from msi_preprocessing_pipeline_spark.operators.privacy import (
        k_anonymity_report)

    df = spark.createDataFrame([], "seg string, zip int")
    r = k_anonymity_report(df, ["seg", "zip"], k=5).collect()[0]
    assert (r["n_rows"], r["n_groups"], r["n_violating_groups"]) == (0, 0, 0)
    assert r["min_group"] is None and r["is_k_anonymous"] is True

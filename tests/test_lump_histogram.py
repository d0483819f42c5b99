"""Rare-category lumping and fixed-range histogram features."""

import numpy as np
import pytest

from msi_preprocessing_pipeline_spark.operators.encoding import (
    lump_rare, value_histogram)


def test_lump_rare_min_count(spark):
    rows = ([("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [(None,)] * 2)
    df = spark.createDataFrame(rows, "cat string")
    out = lump_rare(df, "cat", min_count=3).collect()
    got = {(r["cat"], r["cat_lumped"]) for r in out}
    assert got == {("a", "a"), ("b", "b"), ("c", "__other__"),
                   (None, None)}
    assert len(out) == 11  # row cardinality preserved


def test_lump_rare_min_frac_and_validation(spark):
    rows = [("a",)] * 9 + [("b",)] * 1
    df = spark.createDataFrame(rows, "cat string")
    # b is 10% of non-null total: kept at min_frac=0.1, lumped above
    out = {r["cat_lumped"] for r in
           lump_rare(df, "cat", min_frac=0.1).collect()}
    assert out == {"a", "b"}
    out = {r["cat_lumped"] for r in
           lump_rare(df, "cat", min_frac=0.11).collect()}
    assert out == {"a", "__other__"}
    with pytest.raises(ValueError):
        lump_rare(df, "cat", min_count=-1)
    with pytest.raises(ValueError):
        lump_rare(df, "cat", min_frac=1.5)


def test_value_histogram_matches_numpy(spark):
    rng = np.random.RandomState(5)
    rows = []
    series = {}
    for uid in range(5):
        vals = np.round(rng.uniform(-20, 120, rng.randint(1, 60)), 3)
        series[uid] = vals
        rows += [(uid, float(v)) for v in vals]
    rows += [(0, None), (9, None)]  # null-only entity 9 vanishes
    df = spark.createDataFrame(rows, "uid long, v double")
    got = {r["uid"]: r for r in
           value_histogram(df, "v", ["uid"], 0.0, 100.0, 5).collect()}
    assert set(got) == set(series)
    for uid, vals in series.items():
        bins = np.clip(np.floor(vals / 20.0), 0, 4).astype(int)
        exp = np.bincount(bins, minlength=5)
        assert got[uid]["n_values"] == len(vals)
        assert got[uid]["hist"] == exp.tolist(), uid


def test_value_histogram_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "uid long, v double")
    for kwargs in ({"lo": 5.0, "hi": 5.0, "n_bins": 3},
                   {"lo": 0.0, "hi": 1.0, "n_bins": 0},
                   {"lo": 0.0, "hi": 1.0, "n_bins": 99999}):
        with pytest.raises(ValueError):
            value_histogram(df, "v", ["uid"], **kwargs)


def test_impute_median_per_group_and_all_null_group(spark):
    from msi_preprocessing_pipeline_spark.operators.encoding import (
        impute_median)
    rows = [("a", 1.0), ("a", 3.0), ("a", None),      # median 2.0
            ("b", 10.0), ("b", None), ("b", 20.0), ("b", 99.0),  # med 20
            ("c", None), ("c", None),                 # all-null: stays null
            (None, 5.0), (None, None)]                # null group imputes 5
    df = spark.createDataFrame(rows, "g string, v double")
    out = impute_median(df, "v", ["g"]).collect()
    by = {}
    for g, v, i in [(r["g"], r["v"], r["v_imputed"]) for r in out]:
        by.setdefault(g, []).append((v, i))
    assert (None, 2.0) in by["a"]
    assert (None, 20.0) in by["b"]
    assert (None, None) in by["c"]
    assert (None, 5.0) in by[None]
    # present values pass through untouched
    assert (3.0, 3.0) in by["a"] and (99.0, 99.0) in by["b"]


def test_impute_median_global(spark):
    from msi_preprocessing_pipeline_spark.operators.encoding import (
        impute_median)
    df = spark.createDataFrame([(1.0,), (2.0,), (None,), (4.0,)],
                               "v double")
    out = {r["v"]: r["v_imputed"] for r in impute_median(df, "v").collect()}
    assert out[None] == 2.0  # linear-interp median of [1,2,4]


def test_calendar_features_known_timestamps(spark):
    from msi_preprocessing_pipeline_spark.operators.sequences import (
        calendar_features)
    df = spark.sql("""
        select * from values
          (1, timestamp'1970-01-01 00:00:00'),
          (2, timestamp'2024-02-29 23:59:59'),
          (3, timestamp'2026-08-16 12:30:15'),
          (4, cast(null as timestamp))
        as t(id, ts)""")
    got = {r["id"]: r for r in calendar_features(df, "ts").collect()}
    r = got[1]  # epoch: Thursday
    assert (r["year"], r["month"], r["day"], r["hour"], r["minute"],
            r["dow"], r["is_weekend"], r["days_since_epoch"]) \
        == (1970, 1, 1, 0, 0, 4, False, 0)
    r = got[2]  # leap day 2024: Thursday
    assert (r["year"], r["month"], r["day"], r["hour"], r["minute"],
            r["dow"]) == (2024, 2, 29, 23, 59, 4)
    r = got[3]  # 2026-08-16 is a Sunday
    assert (r["dow"], r["is_weekend"], r["hour"], r["minute"]) \
        == (0, True, 12, 30)
    r = got[4]
    assert all(r[c] is None for c in
               ["year", "month", "day", "hour", "minute", "dow",
                "is_weekend", "days_since_epoch"])


def test_calendar_features_long_ms_column(spark):
    from msi_preprocessing_pipeline_spark.operators.sequences import (
        calendar_features)
    # 86400000 ms = 1970-01-02 (Friday), plus 3h21m
    df = spark.createDataFrame([(1, 86_400_000 + 3 * 3_600_000 + 21 * 60_000)],
                               "id long, ts long")
    r = calendar_features(df, "ts").collect()[0]
    assert (r["year"], r["month"], r["day"], r["hour"], r["minute"],
            r["dow"], r["is_weekend"], r["days_since_epoch"]) \
        == (1970, 1, 2, 3, 21, 5, False, 1)


def test_ecdf_transform_matches_numpy(spark):
    from msi_preprocessing_pipeline_spark.operators.encoding import (
        ecdf_transform)
    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0), ("a", None),
            ("b", 7.0), (None, 3.0), (None, 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = ecdf_transform(df, "v", ["g"]).collect()
    got = {(r["g"], r["v"]): r["v_ecdf"] for r in out}
    assert got[("a", 1.0)] == pytest.approx(1 / 4)
    assert got[("a", 2.0)] == pytest.approx(3 / 4)   # ties share a level
    assert got[("a", 5.0)] == pytest.approx(1.0)
    assert got[("a", None)] is None
    assert got[("b", 7.0)] == pytest.approx(1.0)     # singleton
    assert got[(None, 3.0)] == pytest.approx(0.5)    # null group is a group
    assert got[(None, 4.0)] == pytest.approx(1.0)


def test_ecdf_transform_global_and_row_count(spark):
    from msi_preprocessing_pipeline_spark.operators.encoding import (
        ecdf_transform)
    df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    out = ecdf_transform(df, "v").collect()
    assert len(out) == 10
    assert {r["v_ecdf"] for r in out} == {(i + 1) / 10 for i in range(10)}


# ---------------------------------------------------------------------------
# quantile_normalize


def test_quantile_normalize_equalizes_marginals(spark):
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.encoding import (
        quantile_normalize)

    rng = np.random.default_rng(7)
    rows = ([(i, "a", float(rng.normal(100, 5)))
             for i in range(200)]
            + [(1000 + i, "b", float(rng.normal(500, 50)))
               for i in range(200)])
    df = spark.createDataFrame(rows, "id long, src string, v double")
    out = quantile_normalize(df, "src", "v", "id", scale=3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.qn_u)
    # equal-sized sources: identical normalized marginals
    assert sorted(by_src["a"]) == sorted(by_src["b"])
    # the pooled multiset of target values is drawn from pooled q_u
    pooled = sorted(r.q_u for r in out)
    assert set(r.qn_u for r in out) <= set(pooled)
    # rank order within a source is preserved
    a_rows = sorted((r.q_u, r.id, r.qn_u) for r in out
                    if r.source == "a")
    assert [x[2] for x in a_rows] == sorted(x[2] for x in a_rows)


def test_quantile_normalize_bruteforce_and_invariance(spark):
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.encoding import (
        quantile_normalize)

    rng = np.random.default_rng(23)
    rows = [(i, f"s{i % 3}",
             None if i % 31 == 0 else float(rng.integers(0, 40)))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, src string, v double")
    got = {r.id: (r.q_u, r.qn_u) for r in quantile_normalize(
        df, "src", "v", "id", scale=0).collect()}

    q = lambda v: int(np.floor(v + 0.5))  # noqa: E731
    base = [(i, s, q(v)) for i, s, v in rows if v is not None]
    pooled = sorted(x for _, _, x in base)
    n = len(pooled)
    exp = {}
    for src in {s for _, s, _ in base}:
        mine = sorted((x, i) for i, s, x in base if s == src)
        ns = len(mine)
        for r, (x, i) in enumerate(mine, start=1):
            big = (r * n + ns - 1) // ns
            exp[i] = (x, pooled[big - 1])
    assert got == exp
    run = lambda d: sorted(map(tuple, quantile_normalize(  # noqa: E731
        d, "src", "v", "id", scale=0).collect()))
    assert run(df.repartition(1)) == run(df.repartition(7))

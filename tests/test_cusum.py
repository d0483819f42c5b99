"""CUSUM changepoint: hand-computed break location, single-row/null
edge handling, and partition-count invariance of the exact-integer
argmax contract."""

import numpy as np

from msi_preprocessing_pipeline_spark.operators.drift import (
    cusum_changepoint)


def _rows(level_a, level_b, n_a, n_b):
    rows, t = [], 0
    for _ in range(n_a):
        rows.append(("u1", t, t, float(level_a)))
        t += 1
    for _ in range(n_b):
        rows.append(("u1", t, t, float(level_b)))
        t += 1
    return rows


def _np_cusum(vals, scale=6):
    q = np.floor(np.asarray(vals, dtype=np.float64) * 10.0 ** scale
                 + 0.5).astype(object)  # python ints: exact
    n, s = len(q), sum(q)
    pre, best_i, best_st = 0, None, -1
    for i in range(1, n):  # interior points only (i < n)
        pre = pre + q[i - 1]
        st = abs(n * pre - i * s)
        if st > best_st:
            best_st, best_i = st, i
    return best_i, best_st // n


def test_cusum_locates_level_shift(spark):
    rows = _rows(10.0, 20.0, 6, 4)
    df = spark.createDataFrame(rows, "user_id string, event_id long, "
                                     "ms long, value double")
    out = cusum_changepoint(df, "user_id", "ms", "value",
                            tiebreak=["event_id"]).collect()
    assert len(out) == 1
    r = out[0]
    vals = [v for (_, _, _, v) in rows]
    exp_i, exp_dev = _np_cusum(vals)
    assert r.n_obs == 10
    assert r.cp_index == exp_i == 6  # break right after the last 10.0
    assert r.cp_ms == 5
    assert r.max_dev_u == exp_dev


def test_cusum_edge_rows(spark):
    df = spark.createDataFrame(
        [("a", 1, 1, 5.0),               # single row: no interior point
         ("b", 1, 1, 1.0), ("b", 2, 2, None),   # null value dropped
         ("b", 3, None, 9.0),                   # null ts dropped
         ("b", 4, 3, 2.0)],
        "user_id string, event_id long, ms long, value double")
    out = {r.user_id: r for r in cusum_changepoint(
        df, "user_id", "ms", "value", tiebreak=["event_id"]).collect()}
    assert out["a"].n_obs == 1 and out["a"].cp_index is None
    assert out["a"].max_dev_u is None
    assert out["b"].n_obs == 2 and out["b"].cp_index == 1


def test_cusum_partition_invariant(spark):
    rng = np.random.default_rng(7)
    rows = [(f"u{i % 5}", i, int(rng.integers(0, 10_000)),
             float(rng.normal(100 if i % 5 else 50, 3)))
            for i in range(400)]
    df = spark.createDataFrame(rows, "user_id string, event_id long, "
                                     "ms long, value double")
    a = sorted(map(tuple, cusum_changepoint(
        df.repartition(1), "user_id", "ms", "value",
        tiebreak=["event_id"]).collect()))
    b = sorted(map(tuple, cusum_changepoint(
        df.repartition(13), "user_id", "ms", "value",
        tiebreak=["event_id"]).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# cvm_stat


def _np_cvm(a, b, out_scale=9):
    import numpy as np

    pooled = np.sort(np.concatenate([a, b]))
    n, m = len(a), len(b)
    sa, sb = np.sort(a), np.sort(b)
    num = 0
    for x in pooled:
        fr = int(np.searchsorted(sa, x, side="right"))
        fc = int(np.searchsorted(sb, x, side="right"))
        num += (fr * m - fc * n) ** 2
    den = n * m * (n + m) ** 2
    return (num * 10 ** out_scale) // den


def test_cvm_matches_bruteforce_and_zero_on_identical(spark):
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.drift import cvm_stat

    rng = np.random.default_rng(17)
    a = rng.normal(0, 1, 300).round(3)
    b = rng.normal(0.4, 1.2, 200).round(3)
    ra = spark.createDataFrame([(float(v),) for v in a], "v double")
    rb = spark.createDataFrame([(float(v),) for v in b], "v double")
    r = cvm_stat(ra, rb, "v").collect()[0]
    assert (r.n_ref, r.n_cur) == (300, 200)
    assert r.t_q9 == _np_cvm(a, b)
    same = cvm_stat(ra, ra, "v").collect()[0]
    assert same.t_q9 == 0  # identical samples: every gap is zero


def test_cvm_empty_side_null(spark):
    from msi_preprocessing_pipeline_spark.operators.drift import cvm_stat

    ra = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    rb = spark.createDataFrame([(None,)], "v double")
    r = cvm_stat(ra, rb, "v").collect()[0]
    assert (r.n_ref, r.n_cur, r.t_q9) == (2, 0, None)


# ---------------------------------------------------------------------------
# mwu_stat


def _np_mwu(a, b):
    import numpy as np

    pooled = np.concatenate([a, b])
    vals, counts = np.unique(pooled, return_counts=True)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n, m = len(a), len(b)
    av, ac = np.unique(a, return_counts=True)
    r2x = 0
    for v, cr in zip(av, ac):
        i = int(np.searchsorted(vals, v))
        r2x += int(cr) * (2 * int(cum[i]) + int(counts[i]) + 1)
    u_x2 = r2x - n * (n + 1)
    ties = int(sum(int(w) ** 3 - int(w) for w in counts))
    N = n + m
    var_q = (n * m * ((N + 1) * N * (N - 1) - ties)) \
        // (12 * N * (N - 1))
    z = (u_x2 - n * m) / (2.0 * var_q ** 0.5)
    import math
    return u_x2, int(math.floor(z * 1e6 + 0.5))


def test_mwu_matches_bruteforce_and_scipy_free_sanity(spark):
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.drift import mwu_stat

    rng = np.random.default_rng(29)
    a = rng.normal(0, 1, 250).round(2)
    b = rng.normal(0.5, 1, 180).round(2)  # shifted up → U above nm/2
    ra = spark.createDataFrame([(float(v),) for v in a], "v double")
    rb = spark.createDataFrame([(float(v),) for v in b], "v double")
    r = mwu_stat(ra, rb, "v").collect()[0]
    exp_u, exp_z = _np_mwu(a, b)
    assert (r.n_ref, r.n_cur) == (250, 180)
    assert r.u_x2 == exp_u and r.z_q6 == exp_z
    assert r.z_q6 < -3_000_000  # ref below cur → strongly negative z
    # identical samples: U = nm exactly (2U = 2nm → u_x2 == 2·U…)
    same = mwu_stat(ra, ra, "v").collect()[0]
    assert same.u_x2 == 250 * 250  # 2U = n·m ⇒ U = nm/2: no shift
    assert same.z_q6 == 0


def test_mwu_empty_side(spark):
    from msi_preprocessing_pipeline_spark.operators.drift import mwu_stat

    ra = spark.createDataFrame([(1.0,)], "v double")
    rb = spark.createDataFrame([(None,)], "v double")
    r = mwu_stat(ra, rb, "v").collect()[0]
    assert (r.n_ref, r.n_cur, r.u_x2, r.z_q6) == (1, 0, None, None)

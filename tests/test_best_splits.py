"""Decision-stump split search: brute-force numpy parity of the exact
gain contract, rank-1 determinism, null handling, negative out_scale
units, and the decimal-headroom guard."""

import numpy as np
import pytest

from msi_preprocessing_pipeline_spark.operators.featsel import (
    best_splits, split_candidates)


def _brute(xs, ys, x_scale, y_scale, out_scale):
    """Python-int exact reference for split_candidates on one feature."""
    q = lambda v, s: int(np.floor(v * 10.0 ** s + 0.5))  # noqa: E731
    rows = [(q(x, x_scale), q(y, y_scale))
            for x, y in zip(xs, ys) if x is not None and y is not None]
    n, s = len(rows), sum(y for _, y in rows)
    out = {}
    num_exp, den_exp = max(out_scale, 0), max(-out_scale, 0)
    for t in sorted({x for x, _ in rows}):
        left = [(x, y) for x, y in rows if x <= t]
        nl, sl = len(left), sum(y for _, y in left)
        if nl == n:
            continue
        nr, sr = n - nl, s - sl
        diff = sl * nr - sr * nl
        out[t] = (nl, nr,
                  (diff * diff * 10 ** num_exp)
                  // (nl * nr * 10 ** (2 * y_scale + den_exp)))
    return out


def test_split_candidates_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    xs = rng.integers(0, 12, 300) / 2.0
    ys = np.where(xs <= 3.0, rng.normal(10, 1, 300),
                  rng.normal(25, 1, 300))
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)], "x double, y double")
    got = {r.threshold_u: (r.n_left, r.n_right, r.gain_n_u)
           for r in split_candidates(df, ["x"], "y", x_scales=2,
                                     y_scale=2, out_scale=0).collect()}
    exp = _brute(xs, ys, 2, 2, 0)
    assert got == exp
    best = best_splits(split_candidates(
        df, ["x"], "y", x_scales=2, y_scale=2, out_scale=0)).collect()
    assert len(best) == 1
    # the true break is at x = 3.0 (threshold in centi-units)
    assert best[0].threshold_u == 300
    assert best[0].gain_n_u == max(g for _, _, g in exp.values())


def test_split_candidates_nulls_and_invariance(spark):
    rng = np.random.default_rng(5)
    rows = [(float(rng.integers(0, 8)),
             None if i % 17 == 0 else float(rng.normal(0, 1)),
             None if i % 13 == 0 else float(rng.integers(0, 5)))
            for i in range(400)]
    df = spark.createDataFrame(rows, "a double, b double, y double")
    run = lambda d: sorted(map(tuple, split_candidates(  # noqa: E731
        d, ["a", "b"], "y", x_scales=2, y_scale=2,
        out_scale=-2).collect()))
    assert run(df.repartition(1)) == run(df.repartition(7))
    # pairwise-complete: feature b loses its null rows, a keeps them
    cand = split_candidates(df, ["a", "b"], "y", x_scales=2, y_scale=2)
    tot = {r.feature: r.n_left + r.n_right
           for r in best_splits(cand).collect()}
    n_y = sum(1 for r in rows if r[2] is not None)
    n_by = sum(1 for r in rows if r[1] is not None and r[2] is not None)
    assert tot["a"] == n_y and tot["b"] == n_by


def test_split_candidates_guard_fires(spark):
    df = spark.createDataFrame(
        [(float(i % 3), 9e11 * (i + 1)) for i in range(4)],
        "x double, y double")
    with pytest.raises(Exception, match="headroom"):
        split_candidates(df, ["x"], "y", x_scales=0, y_scale=6,
                         out_scale=6).collect()


# ---------------------------------------------------------------------------
# spearman_corr


def _py_spearman(pairs, shrink_pow=0):
    """Lockstep python-int mirror of the operator's exact pipeline."""
    import numpy as np

    q = lambda v: int(np.floor(v * 1e6 + 0.5))  # noqa: E731
    rows = [(q(a), q(b)) for a, b in pairs
            if a is not None and b is not None]

    def norm_ranks(vals):
        from collections import Counter
        cnt = Counter(vals)
        uniq = sorted(cnt)
        n2x = 2 * len(vals)
        cum, r = 0, {}
        for v in uniq:
            w = cnt[v]
            r2 = 2 * cum + w + 1
            r[v] = (r2 * 1_000_000) // n2x
            cum += w
        return r

    ra = norm_ranks([a for a, _ in rows])
    rb = norm_ranks([b for _, b in rows])
    xs = [(ra[a], rb[b]) for a, b in rows]
    n = len(xs)
    sa, sb = sum(x for x, _ in xs), sum(y for _, y in xs)
    sab = sum(x * y for x, y in xs)
    saa = sum(x * x for x, _ in xs)
    sbb = sum(y * y for _, y in xs)
    g = 10 ** shrink_pow
    tdiv = lambda a, b: abs(a) // b * (1 if a >= 0 else -1)  # noqa: E731
    nx, dx, dy = (tdiv(n * sab - sa * sb, g),
                  tdiv(n * saa - sa * sa, g),
                  tdiv(n * sbb - sb * sb, g))
    if dx <= 0 or dy <= 0:
        return n, None
    import math
    rho = nx / math.sqrt(dx * dy)
    return n, int(math.floor(rho * 1e6 + 0.5))


def test_spearman_matches_lockstep_mirror(spark):
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.featsel import (
        spearman_corr)

    rng = np.random.default_rng(19)
    x = rng.normal(0, 1, 400)
    y = x ** 3 + rng.normal(0, 0.1, 400)  # monotone-ish, nonlinear
    pairs = list(zip(np.round(x, 2), np.round(y, 2)))
    pairs += [(None, 1.0), (2.0, None)]
    df = spark.createDataFrame(
        [(float(a) if a is not None else None,
          float(b) if b is not None else None) for a, b in pairs],
        "a double, b double")
    r = spearman_corr(df, "a", "b", scales=6, shrink_pow=3).collect()[0]
    n, rho = _py_spearman(pairs, 3)
    assert (r.n_pairs, r.rho_u) == (n, rho)
    assert r.rho_u > 950_000  # strongly monotone relationship


def test_spearman_constant_and_invariance(spark):
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.featsel import (
        spearman_corr)

    const = spark.createDataFrame([(1.0, float(i)) for i in range(5)],
                                  "a double, b double")
    r = spearman_corr(const, "a", "b").collect()[0]
    assert (r.n_pairs, r.rho_u) == (5, None)

    rng = np.random.default_rng(5)
    rows = [(float(rng.integers(0, 20)), float(rng.normal(0, 1)))
            for _ in range(500)]
    df = spark.createDataFrame(rows, "a double, b double")
    run = lambda d: spearman_corr(  # noqa: E731
        d, "a", "b", shrink_pow=2).collect()[0]
    assert tuple(run(df.repartition(1))) == tuple(run(df.repartition(7)))

"""ab_stats (CUPED) / contamination_report / token_budget_plan."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.dedup import (
    contamination_report)
from msi_preprocessing_pipeline_spark.operators.experiment import ab_stats
from msi_preprocessing_pipeline_spark.operators.sampling import (
    token_budget_plan)


def test_ab_stats_matches_numpy(spark):
    rng = np.random.RandomState(5)
    rows = []
    for i in range(400):
        grp = "treatment" if i % 2 else "control"
        x = float(rng.rand() * 10)
        y = x * 0.8 + float(rng.rand()) + (0.5 if grp == "treatment" else 0)
        rows.append((grp, round(y, 6), round(x, 6)))
    df = spark.createDataFrame(rows, "grp string, y double, x double")
    out = ab_stats(df, "grp", "y", "control", "treatment",
                   covariate_col="x", scale=6).collect()[0]
    # numpy reference over the SAME quantization
    q = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    yc = np.array([q(r[1]) for r in rows if r[0] == "control"])
    yt = np.array([q(r[1]) for r in rows if r[0] == "treatment"])
    xc = np.array([q(r[2]) for r in rows if r[0] == "control"])
    xt = np.array([q(r[2]) for r in rows if r[0] == "treatment"])
    assert (out.n_c, out.n_t) == (len(yc), len(yt))
    assert math.isclose(out.mean_c, yc.mean(), rel_tol=1e-12)
    assert math.isclose(out.diff, yt.mean() - yc.mean(), rel_tol=1e-9)
    se2 = yc.var(ddof=1) / len(yc) + yt.var(ddof=1) / len(yt)
    assert math.isclose(out.welch_t, (yt.mean() - yc.mean())
                        / math.sqrt(se2), rel_tol=1e-9)
    x_all = np.concatenate([xc, xt])
    y_all = np.concatenate([yc, yt])
    theta = (np.sum(x_all * y_all) - x_all.sum() * y_all.sum()
             / len(x_all)) / \
        (np.sum(x_all * x_all) - x_all.sum() ** 2 / len(x_all))
    assert math.isclose(out.theta, theta, rel_tol=1e-9)
    adj_t = yt.mean() - theta * (xt.mean() - x_all.mean())
    adj_c = yc.mean() - theta * (xc.mean() - x_all.mean())
    assert math.isclose(out.cuped_diff, adj_t - adj_c, rel_tol=1e-9)
    # CUPED must reduce variance on a strongly covariate-driven metric
    assert 0 < out.var_reduction < 0.5
    assert abs(out.cuped_t) > abs(out.welch_t)


def test_ab_stats_partitioning_invariant(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select(F.when(F.col("user_id") % 2 == 0, "control")
                .otherwise("treatment").alias("grp"),
                "value",
                (F.col("value") * 0.5).alias("pre"))
    a = ab_stats(ev.repartition(2), "grp", "value", "control",
                 "treatment", covariate_col="pre").collect()[0]
    b = ab_stats(ev.repartition(16), "grp", "value", "control",
                 "treatment", covariate_col="pre").collect()[0]
    assert a == b  # bit-identical, not allclose


def test_ab_stats_degenerate_guards(spark):
    # constant metric -> welch_t null; covariate == metric (rho2 == 1)
    # -> cuped_t null, never a divide-by-zero / inf
    df = spark.createDataFrame(
        [("control", 1.0, 1.0)] * 3 + [("treatment", 1.0, 1.0)] * 3,
        "grp string, y double, x double")
    r = ab_stats(df, "grp", "y", "control", "treatment",
                 covariate_col="x").collect()[0]
    assert r.welch_t is None and r.theta is None and r.cuped_t is None
    vary = spark.createDataFrame(
        [("control", 1.0, 2.0), ("control", 3.0, 6.0),
         ("treatment", 2.0, 4.0), ("treatment", 5.0, 10.0)],
        "grp string, y double, x double")
    r2 = ab_stats(vary, "grp", "y", "control", "treatment",
                  covariate_col="x").collect()[0]
    # x = 2y exactly even after quantization -> rho2 == 1 -> null cuped_t
    assert r2.theta is not None
    assert r2.cuped_t is None and r2.welch_t is not None


def test_contamination_report_fracs(spark):
    train = spark.createDataFrame(
        [("t1", "a b c d e f"),          # grams: abcde bcdef — both leaked
         ("t2", "a b c d e zz"),         # abcde leaked, bcdezz not
         ("t3", "x y z w v u"),          # disjoint
         ("t4", "q r"),                  # short: one 2-word gram
         ("t5", None)],                  # null text
        "doc_id string, text string")
    bench = spark.createDataFrame(
        [("b1", "a b c d e f g")], "doc_id string, text string")
    out = {r.doc_id: r for r in
           contamination_report(train, bench, k=5).collect()}
    assert out["t1"].n_shingles == 2 and out["t1"].n_contaminated == 2
    assert out["t1"].contamination_frac == 1.0
    assert out["t2"].n_shingles == 2 and out["t2"].n_contaminated == 1
    assert out["t2"].contamination_frac == 0.5
    assert out["t3"].n_contaminated == 0
    assert out["t4"].n_shingles == 1 and out["t4"].n_contaminated == 0
    assert out["t5"].n_shingles == 0
    assert out["t5"].contamination_frac is None


def test_token_budget_plan(spark):
    df = spark.createDataFrame(
        [("a", 100), ("a", 200), ("b", 50), ("c", 1000)],
        "source string, n_tok int")
    out = {r.group: r for r in token_budget_plan(
        df, {"a": 500_000, "b": 400_000}, budget_tokens=1000).collect()}
    ra = out["a"]  # target 500 > available 300 -> exhausted, frac 1
    assert (ra.tokens_available, ra.tokens_target) == (300, 500)
    assert ra.tokens_expected == 300 and ra.exhausted
    assert ra.sample_fraction == 1.0
    rb = out["b"]  # target 400 > available 50
    assert rb.tokens_expected == 50 and rb.exhausted
    rc = out["c"]  # absent from weights -> 0
    assert (rc.weight_ppm, rc.tokens_target, rc.tokens_expected) == (0, 0, 0)
    assert rc.sample_fraction == 0.0 and not rc.exhausted
    with pytest.raises(ValueError):
        token_budget_plan(df, {"a": 900_000, "b": 200_000}, 10)


def test_packing_stats_hand_computed(spark):
    from msi_preprocessing_pipeline_spark.operators.packing import (
        packing_stats)
    df = spark.createDataFrame(
        [("a", 10), ("b", 300), ("c", 0), ("d", 256)],
        "doc_id string, n_tok int")
    r = packing_stats(df, budget=256).collect()[0]
    assert r.n_docs == 4 and r.total_tokens == 566
    assert r.n_truncated_docs == 1          # only the 300-token doc
    # naive: min(len,256) summed = 10+256+0+256 = 522 over 4*256 slots
    assert r.naive_efficiency == 522 / (4 * 256.0)
    # windows: ceil(stream/budget) per md5 bucket — recompute exactly
    import hashlib
    streams = {}
    for doc, n in [("a", 10), ("b", 300), ("c", 0), ("d", 256)]:
        b = hashlib.md5(doc.encode()).hexdigest()[:2]
        streams[b] = streams.get(b, 0) + n
    n_win = sum((s + 255) // 256 for s in streams.values() if s or True)
    assert r.n_windows == n_win
    assert r.packed_efficiency == 566 / (n_win * 256.0)


def test_zipf_fit_matches_numpy(spark):
    import math

    from msi_preprocessing_pipeline_spark.operators.lm import (
        hash_tokenize, zipf_fit)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r = zipf_fit(hash_tokenize(docs), top_n=200, scale=6).collect()[0]
    # numpy reference over the SAME quantization and total rank order
    tok = hash_tokenize(docs).toPandas()
    from collections import Counter
    counts = Counter()
    for arr in tok.tokens:
        if arr is not None:
            counts.update(list(arr))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    x = np.array([math.floor(math.log(i + 1) * 1e6 + 0.5)
                  for i in range(len(ranked))], dtype=object)
    y = np.array([math.floor(math.log(c) * 1e6 + 0.5)
                  for _, c in ranked], dtype=object)
    n = len(x)
    cov = float(sum(a * b for a, b in zip(x, y)) - sum(x) * sum(y) / n)
    varx = float(sum(a * a for a in x) - sum(x) ** 2 / n)
    vary = float(sum(b * b for b in y) - sum(y) ** 2 / n)
    assert r.n_ranks == n
    assert math.isclose(r.slope, cov / varx, rel_tol=1e-9)
    assert -1.5 < r.slope < -0.1          # Zipf-ish negative slope
    assert math.isclose(r.r2, cov * cov / (varx * vary), rel_tol=1e-9)


# ---------------------------------------------------------------------------
# ps_match


def _brute_ps_match(rows, caliper_u, scale=6):
    import numpy as np

    q = lambda v: int(np.floor(v * 10.0 ** scale + 0.5))  # noqa: E731
    ctrl = {}
    for rid, t, v in rows:
        if v is None or t is None or t:
            continue
        s = q(v)
        ctrl[s] = min(ctrl.get(s, rid), rid)
    out = {}
    for rid, t, v in rows:
        if v is None or t is None or not t:
            continue
        s = q(v)
        best = None
        for cs in ctrl:
            d = abs(cs - s)
            if caliper_u is not None and d > caliper_u:
                continue
            # smaller gap wins; ties to the LOWER control score
            key = (d, cs)
            if best is None or key < best:
                best = key
        if best is None:
            out[rid] = (s, None, None, None)
        else:
            d, cs = best
            out[rid] = (s, ctrl[cs], cs, d)
    return out


def test_ps_match_matches_bruteforce(spark):
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.experiment import (
        ps_match)

    rng = np.random.default_rng(3)
    rows = [(i, bool(rng.integers(0, 2)),
             None if i % 29 == 0 else float(rng.normal(0, 1)))
            for i in range(400)]
    # duplicate-score controls to exercise the min-id rule
    rows += [(1000, False, 0.5), (1001, False, 0.5), (1002, True, 0.5)]
    df = spark.createDataFrame(rows, "id long, treat boolean, s double")
    got = {r.id: (r.score_u, r.ctrl_id, r.ctrl_score_u, r.dist_u)
           for r in ps_match(df, "treat", "s", "id",
                             caliper=0.3).collect()}
    exp = _brute_ps_match(rows, 300_000)
    assert got == exp
    assert got[1002] == (500_000, 1000, 500_000, 0)  # exact + min id


def test_ps_match_no_controls_and_invariance(spark):
    from msi_preprocessing_pipeline_spark.operators.experiment import (
        ps_match)

    df = spark.createDataFrame(
        [(1, True, 1.0), (2, True, 9.0)], "id long, t boolean, s double")
    out = {r.id: r for r in ps_match(df, "t", "s", "id").collect()}
    assert all(out[i].ctrl_id is None and out[i].dist_u is None
               for i in (1, 2))

    import numpy as np
    rng = np.random.default_rng(9)
    rows = [(i, bool(rng.integers(0, 2)), float(rng.normal(0, 2)))
            for i in range(500)]
    big = spark.createDataFrame(rows, "id long, t boolean, s double")
    run = lambda d: sorted(map(tuple, ps_match(  # noqa: E731
        d, "t", "s", "id", caliper=0.5).collect()))
    assert run(big.repartition(1)) == run(big.repartition(8))


# ---------------------------------------------------------------------------
# effective_sample_size


def test_ess_hand_cases(spark):
    import pytest as _pytest

    from msi_preprocessing_pipeline_spark.operators.sampling import (
        effective_sample_size)

    rows = [("u", 1.0), ("u", 1.0), ("u", 1.0),      # uniform: ESS = n
            ("s", 1.0), ("s", 0.0), ("s", 0.0),      # one live weight
            ("z", 0.0), ("n", None)]
    df = spark.createDataFrame(rows, "g string, w double")
    out = {r.g: r for r in effective_sample_size(
        df, "w", "g").collect()}
    assert out["u"].ess_u == 3_000_000          # exactly n
    assert out["u"].ess_ratio_u == 1_000_000    # perfectly uniform
    assert out["s"].ess_u == 1_000_000          # concentrated: ESS = 1
    assert out["s"].ess_ratio_u == 333_333
    assert out["z"].ess_u is None               # all-zero weights
    assert "n" not in out                       # null weights drop rows

    neg = spark.createDataFrame([("g", -1.0)], "g string, w double")
    with _pytest.raises(Exception, match="negative weight"):
        effective_sample_size(neg, "w", "g").collect()


def test_ess_matches_numpy_and_invariance(spark):
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.sampling import (
        effective_sample_size)

    rng = np.random.default_rng(37)
    rows = [(f"g{i % 3}", float(rng.gamma(2.0, 1.0))) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, w double")
    got = {r.g: (r.n_obs, r.ess_u, r.ess_ratio_u) for r in
           effective_sample_size(df, "w", "g").collect()}
    for g in ("g0", "g1", "g2"):
        q = [int(np.floor(w * 1e6 + 0.5)) for gg, w in rows if gg == g]
        sw, sww, n = sum(q), sum(x * x for x in q), len(q)
        ess = (sw * sw * 1_000_000) // sww
        assert got[g] == (n, ess, ess // n)
    a = sorted(map(tuple, effective_sample_size(
        df.repartition(1), "w", "g").collect()))
    b = sorted(map(tuple, effective_sample_size(
        df.repartition(9), "w", "g").collect()))
    assert a == b

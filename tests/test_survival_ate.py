"""Kaplan-Meier survival curves (operators/survival.py) and stratified
ATE (operators/experiment.ate_stratified): hand-computed goldens via the
exact integer recurrences, censoring semantics, and partition
invariance (the covariance_embeddings lesson: every contract must be
identical under any partitioning)."""

import math

from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.experiment import (
    ate_stratified, uplift_curve)
from msi_preprocessing_pipeline_spark.operators.survival import (
    km_curve, logrank_test, na_curve, time_to_event)


def _km_ref(pairs, scale=9):
    """Big-int reference of the product-limit recurrence over
    (duration, event) subject pairs -> [(dur, d, n_at_risk, surv_q)]."""
    from collections import Counter
    d = Counter()
    c = Counter()
    for dur, ev in pairs:
        c[dur] += 1
        d[dur] += int(ev)
    out = []
    s = 10 ** scale
    n = len(pairs)
    for t in sorted(c):
        n_at_risk = n
        n -= c[t]
        if d[t] > 0:
            s = (s * (n_at_risk - d[t])) // n_at_risk
            out.append((t, d[t], n_at_risk, s))
    return out


def test_km_curve_textbook_golden(spark):
    # classic 10-subject example: events at 1,2,2,5, censored at
    # 3,4,4,6,8,9 -> S drops only at event times, censored shrink risk
    pairs = [(1, 1), (2, 1), (2, 1), (3, 0), (4, 0),
             (4, 0), (5, 1), (6, 0), (8, 0), (9, 0)]
    df = spark.createDataFrame(pairs, "dur long, ev int")
    got = km_curve(df, "dur", "ev", scale=9).collect()
    ref = _km_ref(pairs)
    assert [(r.dur, r.d_events, r.n_at_risk, r.surv_q9) for r in got] \
        == ref
    # spot-check the first two steps by hand: 10^9*9//10 = 9e8,
    # then *7//9 of the risk set of 9 (two deaths at t=2)
    assert ref[0][3] == 900_000_000
    assert ref[1][3] == (900_000_000 * 7) // 9


def test_km_curve_groups_grid_and_partitioning(spark):
    import random
    rng = random.Random(7)
    rows = [(i % 4, rng.randrange(0, 5000), rng.random() < 0.6)
            for i in range(800)]
    df = spark.createDataFrame(
        [(g, d, int(e)) for g, d, e in rows],
        "grp int, dur long, ev int")
    a = km_curve(df.repartition(2), "dur", "ev", ["grp"],
                 scale=9, grid_ms=250).collect()
    b = km_curve(df.repartition(13), "dur", "ev", ["grp"],
                 scale=9, grid_ms=250).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # per-group parity with the big-int reference on the gridded durs
    for g in range(4):
        pairs = [((d // 250) * 250, e) for gg, d, e in rows if gg == g]
        ref = _km_ref(pairs)
        got = [(r.dur, r.d_events, r.n_at_risk, r.surv_q9)
               for r in a if r.grp == g]
        assert got == ref
    # survival is monotone non-increasing within each group
    for g in range(4):
        s = [r.surv_q9 for r in a if r.grp == g]
        assert all(x >= y for x, y in zip(s, s[1:]))


def _na_ref(pairs, scale=9):
    """Big-int Nelson-Aalen reference -> [(dur, d, n_at_risk, cumhaz)]."""
    from collections import Counter
    c, d = Counter(), Counter()
    for t, e in pairs:
        c[t] += 1
        d[t] += int(e)
    n, cum, out = len(pairs), 0, []
    for t in sorted(c):
        n_at = n
        n -= c[t]
        cum += (10 ** scale * d[t]) // n_at
        if d[t] > 0:
            out.append((t, d[t], n_at, cum))
    return out


def test_na_curve_matches_bigint_reference(spark):
    import random
    rng = random.Random(3)
    pairs = [(rng.randrange(0, 200), int(rng.random() < 0.7))
             for _ in range(600)]
    df = spark.createDataFrame(pairs, "dur long, ev int")
    got = [(r.dur, r.d_events, r.n_at_risk, r.cumhaz_q9)
           for r in na_curve(df.repartition(5), "dur", "ev",
                             scale=9).collect()]
    assert got == _na_ref(pairs)
    # cumhaz is monotone non-decreasing; first row = (1e9*d)//n exactly
    assert all(a[3] <= b[3] for a, b in zip(got, got[1:]))
    t0 = min(t for t, _ in pairs)
    d0 = sum(e for t, e in pairs if t == t0)
    if d0 > 0:
        assert got[0] == (t0, d0, 600, (10 ** 9 * d0) // 600)


def _logrank_ref(rows):
    """Big-int two-sample log-rank reference over (grp, dur, ev)."""
    from collections import Counter
    cg = {0: Counter(), 1: Counter()}
    dg = {0: Counter(), 1: Counter()}
    for g, t, e in rows:
        cg[g][t] += 1
        dg[g][t] += int(e)
    total = {g: sum(cg[g].values()) for g in (0, 1)}
    left = {0: 0, 1: 0}
    o1 = e1 = v = ntimes = 0
    for t in sorted(set(cg[0]) | set(cg[1])):
        n1 = total[1] - left[1]
        n0 = total[0] - left[0]
        na, da = n1 + n0, dg[0][t] + dg[1][t]
        left[0] += cg[0][t]
        left[1] += cg[1][t]
        if da == 0:
            continue
        ntimes += 1
        o1 += dg[1][t]
        e1 += (10 ** 9 * da * n1) // na
        if na > 1:
            t1 = (10 ** 6 * da * n1) // na
            t2 = (10 ** 6 * t1 * n0) // na
            v += (t2 * (na - da)) // (na - 1)
    chi2 = ((o1 * 10 ** 9 - e1) ** 2) // v if v > 0 else None
    return ntimes, o1, e1, v, chi2


def test_logrank_matches_reference_and_discriminates(spark):
    import random
    rng = random.Random(11)
    same = [(rng.randrange(0, 2), rng.randrange(0, 150),
             int(rng.random() < 0.6)) for _ in range(500)]
    df = spark.createDataFrame(same, "grp int, dur long, ev int")
    r = logrank_test(df, "dur", "ev", "grp").collect()[0]
    assert tuple(r) == _logrank_ref(same)
    # under H0 chi2 should be modest; under a hard shift, huge
    shift = [(0, rng.randrange(100, 300), 1) for _ in range(250)] + \
            [(1, rng.randrange(0, 100), 1) for _ in range(250)]
    df2 = spark.createDataFrame(shift, "grp int, dur long, ev int")
    r2 = logrank_test(df2, "dur", "ev", "grp").collect()[0]
    assert tuple(r2) == _logrank_ref(shift)
    assert r2.chi2_q6 > 100 * 10 ** 6 > r.chi2_q6
    # partition invariance (exact-integer contract)
    a = logrank_test(df.repartition(2), "dur", "ev", "grp").collect()[0]
    b = logrank_test(df.repartition(13), "dur", "ev", "grp").collect()[0]
    assert tuple(a) == tuple(b) == tuple(r)


def test_logrank_risk_sets_use_pooled_times(spark):
    # group 0 has an event at t=5 where group 1 has NO row with that
    # duration; n1 at t=5 must still count group-1 subjects with
    # duration > 5 (a per-group risk table would miss this)
    rows = [(0, 5, 1), (0, 10, 1), (1, 8, 1), (1, 12, 0)]
    r = logrank_test(spark.createDataFrame(
        rows, "grp int, dur long, ev int"), "dur", "ev", "grp") \
        .collect()[0]
    assert tuple(r) == _logrank_ref(rows)
    # at t=5: n1=2, n=4, d=1 -> e1 term = 1e9*1*2//4 = 5e8
    ref = _logrank_ref(rows)
    assert ref[2] >= 5 * 10 ** 8


def test_time_to_event_censoring_semantics(spark):
    rows = [
        # u1: origin t=100, purchase at t=400 -> (300, 1)
        (1, 100, "view"), (1, 400, "purchase"), (1, 900, "view"),
        # u2: never purchases, last seen 700 -> censored (600, 0)
        (2, 100, "view"), (2, 700, "click"),
        # u3: purchase IS the first event -> (0, 1)
        (3, 50, "purchase"),
    ]
    df = spark.createDataFrame(rows, "u long, ms long, t string") \
        .select("u", F.timestamp_millis(F.col("ms")).alias("ts"), "t")
    out = {r.entity: (r.duration_ms, r.event)
           for r in time_to_event(df, "u", "ts",
                                  F.col("t") == "purchase").collect()}
    assert out == {1: (300, 1), 2: (600, 0), 3: (0, 1)}
    # origin_pred: measure from first CLICK; u1/u3 have none -> dropped
    out2 = {r.entity: (r.duration_ms, r.event)
            for r in time_to_event(
                df, "u", "ts", F.col("t") == "purchase",
                origin_pred=F.col("t") == "click").collect()}
    assert out2 == {2: (0, 0)}


def test_ate_stratified_hand_computed(spark):
    # stratum 0: treated outcomes {10, 20}, control {4}; stratum 1:
    # treated {3}, control {5, 9}; stratum 2: control-only -> dropped
    rows = [(1, 10, 0), (1, 20, 0), (0, 4, 0),
            (1, 3, 1), (0, 5, 1), (0, 9, 1),
            (0, 100, 2)]
    df = spark.createDataFrame(rows, "treat int, y long, s int")
    got = {r.stratum: r for r in
           ate_stratified(df, "treat", "y", "s",
                          scale=0, diff_scale=6).collect()}
    assert set(got) == {0, 1}
    r0, r1 = got[0], got[1]
    assert (r0.n_t, r0.n_c, r0.sy_t_u, r0.sy_c_u) == (2, 1, 30, 4)
    # diff_0 = (30*1 - 4*2) * 1e6 // (2*1) = 11e6; diff_1 =
    # (3*2 - 14*1) * 1e6 // 2 = -4e6 exactly (no truncation ambiguity)
    assert r0.diff_q6 == 11_000_000
    assert r1.diff_q6 == -4_000_000
    # pooled = trunc((3*11e6 + 3*(-4e6)) / 6) = 3.5e6
    assert r0.ate_q6 == r1.ate_q6 == 3_500_000


def test_ate_stratified_truncation_toward_zero(spark):
    # negative diff with a non-exact quotient: treated mean 1, control
    # mean 8/3 -> diff = -5/3; trunc(-5e6/3) = -1666666 (NOT floor's
    # -1666667) -- pins the DuckDB `//` contract
    rows = [(1, 1, 0), (0, 2, 0), (0, 3, 0), (0, 3, 0)]
    df = spark.createDataFrame(rows, "treat int, y long, s int")
    r = ate_stratified(df, "treat", "y", "s",
                       scale=0, diff_scale=6).collect()[0]
    assert r.diff_q6 == -1_666_666
    assert r.ate_q6 == -1_666_666


def test_ate_stratified_partitioning_invariant(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select((F.col("user_id") % 2).cast("int").alias("treat"),
                (F.col("event_id") % 5).cast("int").alias("s"),
                "value")
    a = ate_stratified(ev.repartition(2), "treat", "value", "s",
                       scale=2).collect()
    b = ate_stratified(ev.repartition(11), "treat", "value", "s",
                       scale=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 5


def _uplift_ref(rows, n_buckets=10, scale=2, q_scale=6):
    """Big-int uplift/Qini reference over (id, treat, y, score) rows."""
    import math

    def trunc(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    units = sorted(rows, key=lambda r: (-r[3], r[0]))
    n = len(units)
    per = {}
    for rk, (i, t, y, s) in enumerate(units):
        e = per.setdefault(rk * n_buckets // n, [0, 0, 0, 0])
        yq = math.floor(y * 10 ** scale + 0.5)
        if t:
            e[0] += 1
            e[2] += yq
        else:
            e[1] += 1
            e[3] += yq
    out, cnt, cnc, cyt, cyc = [], 0, 0, 0, 0
    for bkt in sorted(per):
        n_t, n_c, syt, syc = per[bkt]
        cnt += n_t
        cnc += n_c
        cyt += syt
        cyc += syc
        up = (trunc(10 ** q_scale * (syt * n_c - syc * n_t),
                    n_t * n_c * 10 ** scale) if n_t and n_c else None)
        qi = (trunc(10 ** q_scale * (cyt * cnc - cyc * cnt),
                    cnc * 10 ** scale) if cnc else None)
        out.append((bkt, n_t, n_c, syt, syc, up, cnt, cnc, qi))
    return out


def test_uplift_curve_matches_reference(spark):
    import random
    rng = random.Random(9)
    rows = []
    for i in range(1000):
        t = rng.randrange(0, 2)
        s = rng.randrange(0, 500)   # score with heavy ties
        y = round(s * 0.01 + (0.5 if t else 0.0) * (s / 500)
                  + rng.random(), 2)
        rows.append((i, t, y, s))
    df = spark.createDataFrame(rows, "id long, treat int, y double, "
                                     "score long")
    got = [tuple(r) for r in
           uplift_curve(df.repartition(7), "treat", "y", "score", "id",
                        n_buckets=10, scale=2, q_scale=6).collect()]
    ref = _uplift_ref(rows)
    assert got == ref
    # the synthetic effect GROWS with score, so top-decile uplift must
    # beat bottom-decile, and the final qini is the overall incremental
    assert got[0][5] > got[-1][5]
    # bucket sizes exact-equal split of 1000 into 10
    assert all(r[1] + r[2] == 100 for r in got)
    # partition invariance
    b = [tuple(r) for r in
         uplift_curve(df.repartition(2), "treat", "y", "score", "id",
                      n_buckets=10, scale=2, q_scale=6).collect()]
    assert b == got


def test_uplift_curve_empty_arm_nulls(spark):
    # all-treated bucket -> uplift null; cum control appears later ->
    # qini null until the first control row
    rows = [(1, 1, 10.0, 100), (2, 1, 20.0, 90),
            (3, 0, 5.0, 10), (4, 1, 1.0, 5)]
    df = spark.createDataFrame(rows, "id long, treat int, y double, "
                                     "score long")
    got = uplift_curve(df, "treat", "y", "score", "id",
                       n_buckets=2, scale=0, q_scale=6).collect()
    assert got[0].uplift_q6 is None and got[0].qini_q6 is None
    assert got[1].qini_q6 is not None


def test_rmst_step_integration_and_clamp(spark):
    from msi_preprocessing_pipeline_spark.operators.survival import rmst

    # hand case: 4 subjects, events at 10 (n=4) and 30 (n=2), censor 20
    # S(10)=0.75, S(30)=0.375; tau=25 clamps the last segment
    rows = [(10, 1), (20, 0), (30, 1), (40, 0)]
    df = spark.createDataFrame(rows, "dur long, ev int")
    r = rmst(df, "dur", "ev", tau=25).collect()[0]
    # integral: 1.0*10 + 0.75*(25-10) = 21.25 (the t=30 event is
    # beyond tau; its curve row contributes a zero-length segment and
    # the final term uses S at the LAST event time, clamped)
    b = 10 ** 9
    s10 = (b * 3) // 4
    s30 = (s10 * 1) // 2
    expect = b * 10 + s10 * (25 - 10) + s30 * (25 - 25)
    assert r.rmst_q9ms == expect and r.tau_ms == 25
    assert r.n_event_times == 2

    # tau beyond all data: integral extends at the final S level
    r2 = rmst(df, "dur", "ev", tau=100).collect()[0]
    expect2 = b * 10 + s10 * (30 - 10) + s30 * (100 - 30)
    assert r2.rmst_q9ms == expect2


def test_rmst_groups_partition_invariant(spark):
    import random
    from msi_preprocessing_pipeline_spark.operators.survival import rmst

    rng = random.Random(21)
    rows = [(i % 3, rng.randrange(0, 1000), int(rng.random() < 0.55))
            for i in range(900)]
    df = spark.createDataFrame(rows, "g int, dur long, ev int")
    a = rmst(df.repartition(2), "dur", "ev", 600, ["g"]).collect()
    b = rmst(df.repartition(11), "dur", "ev", 600, ["g"]).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # RMST <= tau * 1e9 always (S <= 1)
    assert all(r.rmst_q9ms <= 600 * 10 ** 9 for r in a)


def test_sequential_ab_boundaries_and_crossing(spark):
    import random
    from msi_preprocessing_pipeline_spark.operators.experiment import (
        sequential_ab)

    rng = random.Random(5)
    # planted effect: treatment mean 1.0 higher; 6 daily looks
    rows = [(rng.randrange(0, 2), d, 0.0) for d in range(6)
            for _ in range(200)]
    rows = [(t, d, round(rng.gauss(5.0 + t, 1.0), 3)) for t, d, _ in rows]
    df = spark.createDataFrame(rows, "t int, day int, y double")
    out = sequential_ab(df, "t", "y", "day", alpha=0.05).collect()
    assert len(out) == 6 and [r.k for r in out] == list(range(1, 7))
    # OBF boundary: monotone decreasing, final look = z_{alpha/2}
    bounds = [r.bound_q6 for r in out]
    assert bounds == sorted(bounds, reverse=True)
    assert abs(bounds[-1] - 1_959_964) <= 1
    # a 1-sigma effect at n~600/arm crosses well before the last look
    assert any(r.crossed for r in out)
    assert out[-1].crossed
    # cumulative counts are monotone and consistent
    assert all(a.cum_n_t <= b.cum_n_t for a, b in zip(out, out[1:]))

    # null effect: no crossing (conservative early boundaries)
    rows0 = [(rng.randrange(0, 2), d, round(rng.gauss(5.0, 1.0), 3))
             for d in range(6) for _ in range(200)]
    df0 = spark.createDataFrame(rows0, "t int, day int, y double")
    out0 = sequential_ab(df0, "t", "y", "day").collect()
    assert not any(r.crossed for r in out0)
    # partition invariance of the full row set
    a = sequential_ab(df.repartition(2), "t", "y", "day").collect()
    b = sequential_ab(df.repartition(13), "t", "y", "day").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] \
        == [tuple(r) for r in out]


def test_sequential_ab_degenerate_looks(spark):
    from msi_preprocessing_pipeline_spark.operators.experiment import (
        sequential_ab)

    # look 0 has a single treated unit -> z null, crossed False; by
    # look 1 both arms have >=2 and a constant metric -> se=0 -> null
    rows = [(1, 0, 1.0), (1, 1, 1.0), (0, 1, 1.0),
            (0, 1, 1.0), (1, 1, 1.0)]
    df = spark.createDataFrame(rows, "t int, day int, y double")
    out = sequential_ab(df, "t", "y", "day").collect()
    assert out[0].z_q6 is None and not out[0].crossed
    assert out[1].z_q6 is None and not out[1].crossed


def _cif_ref(pairs, scale=9):
    """Big-int Aalen-Johansen reference over (dur, cause) pairs."""
    from collections import Counter
    c, d, d1, d2 = Counter(), Counter(), Counter(), Counter()
    for t, cz in pairs:
        c[t] += 1
        if cz > 0:
            d[t] += 1
        if cz == 1:
            d1[t] += 1
        if cz == 2:
            d2[t] += 1
    n, s, c1, c2, out = len(pairs), 10 ** scale, 0, 0, []
    for t in sorted(c):
        n_at = n
        n -= c[t]
        if d[t] > 0:
            c1 += (s * d1[t]) // n_at
            c2 += (s * d2[t]) // n_at
            s = (s * (n_at - d[t])) // n_at
            out.append((t, d[t], n_at, s, c1, c2))
    return out


def test_cif_curves_match_bigint_reference(spark):
    import random
    from msi_preprocessing_pipeline_spark.operators.survival import (
        cif_curves)

    rng = random.Random(13)
    pairs = [(rng.randrange(0, 300), rng.choice([0, 0, 1, 1, 2]))
             for _ in range(800)]
    df = spark.createDataFrame(pairs, "dur long, cause int")
    got = [(r.dur, r.d_all, r.n_at_risk, r.surv_q9, r.cif1_q9,
            r.cif2_q9)
           for r in cif_curves(df.repartition(5), "dur", "cause",
                               2).collect()]
    assert got == _cif_ref(pairs)
    # conservation: S + CIF1 + CIF2 = 1 minus a bounded floor deficit
    for g in got:
        deficit = 10 ** 9 - (g[3] + g[4] + g[5])
        assert 0 <= deficit < 3 * len(got)
    # CIFs monotone non-decreasing
    for i in (4, 5):
        seq = [g[i] for g in got]
        assert seq == sorted(seq)
    # partition invariance (grouped)
    df2 = df.withColumn("g", (F.col("dur") % 2).cast("int"))
    a = [tuple(r) for r in
         cif_curves(df2.repartition(2), "dur", "cause", 2,
                    ["g"]).collect()]
    b = [tuple(r) for r in
         cif_curves(df2.repartition(11), "dur", "cause", 2,
                    ["g"]).collect()]
    assert a == b


def test_time_to_competing_event_semantics(spark):
    from msi_preprocessing_pipeline_spark.operators.survival import (
        time_to_competing_event)

    evs = [
        (1, 100, "view"), (1, 200, "purchase"), (1, 300, "error"),
        (2, 50, "view"), (2, 80, "error"),
        (3, 10, "view"), (3, 40, "click"),
        (4, 10, "purchase"),
    ]
    edf = spark.createDataFrame(evs, "u long, ms long, t string") \
        .select("u", F.timestamp_millis(F.col("ms")).alias("ts"), "t")
    out = {r.entity: (r.duration_ms, r.cause)
           for r in time_to_competing_event(
               edf, "u", "ts",
               [F.col("t") == "purchase",
                F.col("t") == "error"]).collect()}
    # u1: purchase first (cause 1 @ 100ms); u2: error (cause 2 @ 30);
    # u3: censored @ last-seen; u4: purchase at origin
    assert out == {1: (100, 1), 2: (30, 2), 3: (30, 0), 4: (0, 1)}


def test_moment_sums_survive_large_outcomes(spark):
    """Regression: micro-unit squares must multiply IN DECIMAL — at
    scale=6 a value of 4000.0 squares to 1.6e19 > int64, which wrapped
    silently before the fix (review finding, session 10)."""
    from msi_preprocessing_pipeline_spark.operators.experiment import (
        ab_stats, sequential_ab)

    rows = [("control", 4000.0, 4000.0), ("control", 4002.0, 4001.0),
            ("treatment", 4003.0, 4000.5), ("treatment", 4001.0, 4002.0)]
    df = spark.createDataFrame(rows, "grp string, y double, x double")
    r = ab_stats(df, "grp", "y", "control", "treatment",
                 covariate_col="x", scale=6).collect()[0]
    assert abs(r.mean_c - 4001.0) < 1e-9 and abs(r.mean_t - 4002.0) < 1e-9
    assert r.welch_t is not None and abs(r.diff - 1.0) < 1e-9

    rows2 = [(1, 0, 4000.0), (1, 0, 4002.0), (0, 0, 4001.0),
             (0, 0, 4003.0), (1, 1, 4004.0), (0, 1, 4000.0)]
    df2 = spark.createDataFrame(rows2, "t int, day int, y double")
    out = sequential_ab(df2, "t", "y", "day", scale=6).collect()
    # python reference for the final look's z over ALL rows
    import math
    yt = [4000.0, 4002.0, 4004.0]
    yc = [4001.0, 4003.0, 4000.0]
    q = lambda v: math.floor(v * 1e6 + 0.5)  # noqa: E731
    syt, syyt = sum(map(q, yt)), sum(q(v) ** 2 for v in yt)
    syc, syyc = sum(map(q, yc)), sum(q(v) ** 2 for v in yc)
    nt = nc = 3.0
    vt = (syyt - syt * syt / nt) / (nt - 1.0)
    vc = (syyc - syc * syc / nc) / (nc - 1.0)
    z = (syt / nt - syc / nc) / math.sqrt(vt / nt + vc / nc)
    assert out[-1].z_q6 == math.floor(z * 1e6 + 0.5)


def test_seq_ab_constant_metric_no_spurious_crossing(spark):
    """Regression: a zero (or cancellation-negative) pooled variance
    must yield z_q6 null and crossed False — never NaN>bound=True."""
    from msi_preprocessing_pipeline_spark.operators.experiment import (
        sequential_ab)

    rows = [(t, d, 7.0) for t in (0, 1) for d in range(3)
            for _ in range(10)]
    df = spark.createDataFrame(rows, "t int, day int, y double")
    out = sequential_ab(df, "t", "y", "day").collect()
    assert all(r.z_q6 is None and r.crossed is False for r in out)


def test_mde_ab_matches_numpy(spark):
    import math
    import numpy as np
    from msi_preprocessing_pipeline_spark.kernels.special import norm_ppf
    from msi_preprocessing_pipeline_spark.operators.experiment import (
        mde_ab)

    rng = np.random.RandomState(2)
    rows = [(int(i % 2), round(float(rng.normal(50, 10)), 4))
            for i in range(800)]
    df = spark.createDataFrame(rows, "t int, y double")
    r = mde_ab(df, "t", "y", alpha=0.05, power=0.8, scale=6).collect()[0]
    q = lambda v: math.floor(v * 1e6 + 0.5)  # noqa: E731
    yt = np.array([q(y) for t, y in rows if t == 1], dtype=object)
    yc = np.array([q(y) for t, y in rows if t == 0], dtype=object)
    nt, nc = float(len(yt)), float(len(yc))
    var_t = (float(sum(yt * yt)) - float(sum(yt)) ** 2 / nt) / (nt - 1)
    var_c = (float(sum(yc * yc)) - float(sum(yc)) ** 2 / nc) / (nc - 1)
    z = float(norm_ppf(0.975)) + float(norm_ppf(0.8))
    mde = z * math.sqrt(var_t / nt + var_c / nc) / 1e6
    assert math.isclose(r.mde_abs, mde, rel_tol=1e-12)
    assert math.isclose(r.mean_c, float(sum(yc)) / nc / 1e6,
                        rel_tol=1e-12)
    # ~10-unit sd at n=400/arm -> MDE around 2 units, rel ~4%
    assert 1.0 < r.mde_abs < 3.0 and r.n_per_arm_for_5pct > 100
    # degenerate: constant metric -> nulls
    dfc = spark.createDataFrame([(0, 5.0), (0, 5.0), (1, 5.0),
                                 (1, 5.0)], "t int, y double")
    rc = mde_ab(dfc, "t", "y").collect()[0]
    assert rc.mde_abs is None and rc.n_per_arm_for_5pct is None


def test_raking_weights_ipf(spark):
    import random
    from collections import Counter
    from msi_preprocessing_pipeline_spark.operators.sampling import (
        raking_weights)

    rng = random.Random(17)
    rows = [(rng.choice("abc"), rng.choice("xy")) for _ in range(2000)]
    df = spark.createDataFrame(rows, "r string, c string")
    rt, ct, it, sc = {"a": 5, "b": 3, "c": 2}, {"x": 1, "y": 1}, 3, 9

    # big-int IPF reference with the same two-stage divisions
    cells = Counter(rows)
    w = {k: v * 10 ** sc for k, v in cells.items()}
    u_r, u_c = sum(rt.values()), sum(ct.values())
    for _ in range(it):
        for dim, tgt, u in ((0, rt, u_r), (1, ct, u_c)):
            tot = sum(w.values())
            marg = Counter()
            for k, v in w.items():
                marg[k[dim]] += v
            t_abs = {m: (tgt[m] * tot) // u for m in tgt}
            w = {k: (v * t_abs[k[dim]]) // marg[k[dim]]
                 for k, v in w.items()}
    got = {(x.r, x.c): (x.n, x.w_q9, x.unit_w_q9)
           for x in raking_weights(df, "r", "c", rt, ct,
                                   iters=it, scale=sc).collect()}
    assert got == {k: (cells[k], w[k], w[k] // cells[k])
                   for k in cells}
    # both marginals converge to their targets within 2%
    tot = sum(v for _, v, _ in got.values())
    for r in rt:
        sr = sum(v for (rr, _), (_, v, _) in got.items() if rr == r)
        assert abs(sr / tot - rt[r] / u_r) < 0.02
    for c in ct:
        sc_ = sum(v for (_, cc), (_, v, _) in got.items() if cc == c)
        assert abs(sc_ / tot - ct[c] / u_c) < 0.02
    # partition invariance
    a = raking_weights(df.repartition(2), "r", "c", rt, ct).collect()
    b = raking_weights(df.repartition(13), "r", "c", rt, ct).collect()
    assert [tuple(x) for x in a] == [tuple(x) for x in b]


def test_srm_check_flags_biased_split(spark):
    import math
    from msi_preprocessing_pipeline_spark.operators.experiment import (
        srm_check)

    # intended 1:1, realized 600:400 -> chi2 = 2*(100^2/500) = 40
    rows = [(1,)] * 600 + [(0,)] * 400
    df = spark.createDataFrame(rows, "t int")
    r = srm_check(df, "t").collect()[0]
    assert (r.n_t, r.n_c) == (600, 400)
    assert r.chi2_q6 == math.floor(40.0 * 1e6 + 0.5) and r.srm_flag
    # balanced split under a 3:2 intent -> no flag
    r2 = srm_check(spark.createDataFrame(
        [(1,)] * 599 + [(0,)] * 401, "t int"), "t",
        ratio_t=3, ratio_c=2).collect()[0]
    assert not r2.srm_flag
    # empty input -> nulls, no flag
    r3 = srm_check(df.where("t > 5"), "t").collect()[0]
    assert r3.chi2_q6 is None and r3.srm_flag is False

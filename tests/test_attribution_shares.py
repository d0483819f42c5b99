"""attribution_shares: exact Hamilton-split multi-touch credit."""

import pytest

from msi_preprocessing_pipeline_spark.operators.behavior import (
    attribution_shares)

SCALE = 1_000_000


def _shares_py(convs, touches, model, horizon, halflife=3_600_000,
               split=(40, 20, 40)):
    out = {}
    for cid, (e, cms) in convs.items():
        tl = sorted((tms, tid) for tid, (te, tms) in touches.items()
                    if te == e and cms - horizon <= tms < cms)
        if not tl:
            continue
        n = len(tl)
        if model == "linear":
            ws = [1] * n
        elif model == "position":
            pf, pm, pl = split
            mid = max(n - 2, 1)
            ws = [pf * mid if r == 0 else pl * mid if r == n - 1 else pm
                  for r in range(n)] if n > 1 else [1]
        else:
            ks = [(cms - tms) // halflife for tms, _ in tl]
            kmax = max(ks)
            ws = [1 << (kmax - k) for k in ks]
        tw = sum(ws)
        base = [SCALE * w // tw for w in ws]
        rem = [SCALE * w % tw for w in ws]
        left = SCALE - sum(base)
        order = sorted(range(n), key=lambda i: (-rem[i], i))
        for j in order[:left]:
            base[j] += 1
        for r, ((tms, tid), b) in enumerate(zip(tl, base), 1):
            out[(cid, tid)] = (r, n, b)
    return out


def _mk(spark, convs, touches):
    c = spark.createDataFrame(
        [(cid, e, ms) for cid, (e, ms) in convs.items()],
        "event_id long, user_id long, ms long")
    t = spark.createDataFrame(
        [(tid, e, ms) for tid, (e, ms) in touches.items()],
        "event_id long, user_id long, ms long")
    return c, t


CONVS = {100: (1, 10_000), 101: (1, 50_000), 102: (2, 9_000),
         103: (3, 99_000)}  # 103: no touches
TOUCHES = {1: (1, 1_000), 2: (1, 5_000), 3: (1, 9_999), 4: (1, 10_000),
           5: (1, 49_000), 6: (2, 2), 7: (2, 8_999)}


@pytest.mark.parametrize("model", ["linear", "position", "time_decay"])
def test_shares_match_python_and_sum_to_scale(spark, model):
    c, t = _mk(spark, CONVS, TOUCHES)
    got = {(r["conv_id"], r["touch_id"]):
           (r["touch_rank"], r["n_touches"], r["credit"])
           for r in attribution_shares(
               c, t, model=model, horizon_ms=20_000,
               halflife_ms=2_000).collect()}
    exp = _shares_py(CONVS, TOUCHES, model, 20_000, 2_000)
    assert got == exp
    # touch 4 sits AT conversion 100's instant -> excluded (no leakage)
    assert (100, 4) not in got
    # conversion 103 has no touches -> absent
    assert not [k for k in got if k[0] == 103]
    # per-conversion credits sum to exactly SCALE
    sums = {}
    for (cid, _), (_, _, cr) in got.items():
        sums[cid] = sums.get(cid, 0) + cr
    assert all(v == SCALE for v in sums.values())


def test_position_two_touch_renormalizes_even(spark):
    convs = {9: (7, 1_000_000)}
    touches = {71: (7, 900_000), 72: (7, 950_000)}
    c, t = _mk(spark, convs, touches)
    got = {r["touch_id"]: r["credit"]
           for r in attribution_shares(
               c, t, model="position", horizon_ms=200_000).collect()}
    assert got == {71: SCALE // 2, 72: SCALE // 2}


def test_time_decay_orders_by_recency_and_partition_invariance(spark):
    convs = {9: (7, 100_000)}
    touches = {71: (7, 10_000), 72: (7, 60_000), 73: (7, 99_000)}
    c, t = _mk(spark, convs, touches)
    out = attribution_shares(c, t, model="time_decay",
                             horizon_ms=100_000, halflife_ms=10_000)
    got = {r["touch_id"]: r["credit"] for r in out.collect()}
    assert got[73] > got[72] > got[71]
    got7 = {r["touch_id"]: r["credit"]
            for r in attribution_shares(
                c.repartition(5), t.repartition(3), model="time_decay",
                horizon_ms=100_000, halflife_ms=10_000).collect()}
    assert got7 == got


def test_validates_args(spark):
    c, t = _mk(spark, CONVS, TOUCHES)
    with pytest.raises(ValueError):
        attribution_shares(c, t, model="markov")
    with pytest.raises(ValueError):
        attribution_shares(c, t, model="time_decay", halflife_ms=0)
    with pytest.raises(ValueError):
        attribution_shares(c, t, model="time_decay",
                           horizon_ms=86_400_000, halflife_ms=1_000)
    with pytest.raises(ValueError):
        attribution_shares(c, t, model="position",
                           position_split=(-1, 2, 99))

"""isotonic_calibration: PAV fixpoint vs a naive reference, strict
monotonicity, mass preservation, exact rationals, invariance, guard."""
import pytest
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.experiment import (
    isotonic_calibration)


def _df(spark, pairs):
    return spark.createDataFrame(
        [Row(score=s, label=y) for s, y in pairs],
        "score double, label int")


def _naive_pav(groups):
    """O(n^2) reference: repeatedly merge ANY adjacent violator pair
    until monotone — the fixpoint is unique, so it must equal the
    one-pass stack version."""
    blocks = [list(b) for b in groups]  # [lo, hi, n, pos]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            l, r = blocks[i], blocks[i + 1]
            if l[3] * r[2] >= r[3] * l[2]:
                blocks[i] = [l[0], r[1], l[2] + r[2], l[3] + r[3]]
                del blocks[i + 1]
                changed = True
                break
    return blocks


def test_matches_naive_fixpoint_and_monotone(spark):
    pairs = []
    import hashlib
    for i in range(300):
        s = ((i * 17) % 100) / 100.0
        # noisy monotone-ish labels, deterministic
        h = int(hashlib.md5(f"{i}".encode()).hexdigest()[:4], 16)
        y = 1 if (h % 100) < (s * 80 + 10) else 0
        pairs.append((s, y))
    got = isotonic_calibration(_df(spark, pairs), "score", "label") \
        .orderBy("score_lo_q").collect()
    # reference from the same aggregated relation
    agg = {}
    for s, y in pairs:
        q = int(s * 1e6 + 0.5)
        n, p = agg.get(q, (0, 0))
        agg[q] = (n + 1, p + y)
    groups = [[q, q, n, p] for q, (n, p) in sorted(agg.items())]
    exp = _naive_pav(groups)
    assert [(r["score_lo_q"], r["score_hi_q"], r["n"], r["n_pos"])
            for r in got] == [tuple(b) for b in exp]
    # strictly increasing calibrated rates across blocks
    rates = [(r["cal_num"], r["cal_den"]) for r in got]
    for (a, b), (c, d) in zip(rates, rates[1:]):
        assert a * d < c * b
    # mass preserved
    assert sum(r["n"] for r in got) == 300
    assert sum(r["n_pos"] for r in got) == sum(y for _, y in pairs)


def test_perfectly_inverted_scores_pool_to_one_block(spark):
    pairs = [(0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)]
    got = isotonic_calibration(_df(spark, pairs), "score", "label") \
        .collect()
    assert len(got) == 1
    assert got[0]["cal_num"] == 2 and got[0]["cal_den"] == 4


def test_null_scores_dropped_null_labels_negative(spark):
    pairs = [(None, 1), (0.5, None), (0.5, 1)]
    got = isotonic_calibration(_df(spark, pairs), "score", "label") \
        .collect()
    assert len(got) == 1
    assert got[0]["n"] == 2 and got[0]["n_pos"] == 1


def test_partition_invariance(spark):
    pairs = [((i % 10) / 10.0, (i * 7) % 2) for i in range(100)]
    a = sorted(map(tuple, isotonic_calibration(
        _df(spark, pairs), "score", "label").collect()))
    b = sorted(map(tuple, isotonic_calibration(
        _df(spark, pairs).repartition(9), "score", "label").collect()))
    assert a == b


def test_distinct_guard(spark):
    pairs = [(i / 1000.0, i % 2) for i in range(50)]
    with pytest.raises(ValueError, match="distinct quantized"):
        isotonic_calibration(_df(spark, pairs), "score", "label",
                             max_distinct=10)

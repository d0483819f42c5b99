"""histogram_match_sample: python-mirror exactness, shape matching,
best-bin keeps all, no-overlap empty, partition invariance."""
import hashlib
import math

from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.sampling import (
    histogram_match_sample)


def _df(spark, vals):
    return spark.createDataFrame(
        [Row(k=i, v=float(x)) for i, x in enumerate(vals)],
        "k long, v double")


def _bin(v, lo, hi, n):
    w = (hi - lo) / n
    return min(max(math.floor((v - lo) / w), 0), n - 1)


def _mirror(vals, ref_vals, lo, hi, n, seed=0):
    rc, sc = {}, {}
    for v in ref_vals:
        rc[_bin(v, lo, hi, n)] = rc.get(_bin(v, lo, hi, n), 0) + 1
    for v in vals:
        sc[_bin(v, lo, hi, n)] = sc.get(_bin(v, lo, hi, n), 0) + 1
    best = None
    for b in sorted(sc):
        rb, sb = rc.get(b, 0), sc[b]
        if rb == 0:
            continue
        if best is None or rb * sc[best] > rc[best] * sb:
            best = b
    kept = set()
    if best is None:
        return kept
    for i, v in enumerate(vals):
        b = _bin(v, lo, hi, n)
        num = rc.get(b, 0) * sc[best]
        den = sc[b] * rc[best]
        draw = int(hashlib.md5(f"{i}:{seed}".encode())
                   .hexdigest()[:15], 16)
        if draw * den < num * 2**60:
            kept.add(i)
    return kept


def test_matches_python_mirror(spark):
    vals = [(i * 7) % 100 for i in range(400)]          # uniform-ish
    ref = [min((i % 20) ** 2, 99) for i in range(300)]  # skewed low
    got = {r["k"] for r in histogram_match_sample(
        _df(spark, vals), _df(spark, ref), "v", "k", 0.0, 100.0,
        n_bins=10).collect()}
    assert got == _mirror(vals, ref, 0.0, 100.0, 10)
    assert 0 < len(got) < 400


def test_output_shape_tracks_reference(spark):
    vals = [(i * 7) % 100 for i in range(2000)]
    ref = [min((i % 30) ** 2 // 10, 99) for i in range(900)]
    out = [r["v"] for r in histogram_match_sample(
        _df(spark, vals), _df(spark, ref), "v", "k", 0.0, 100.0,
        n_bins=5).collect()]
    def share(xs, b):
        return sum(1 for x in xs if _bin(x, 0, 100, 5) == b) / len(xs)
    # the kept sample must be closer to ref's bin shares than raw src
    for b in range(5):
        raw_gap = abs(share(vals, b) - share(ref, b))
        new_gap = abs(share(out, b) - share(ref, b))
        assert new_gap <= raw_gap + 0.05, (b, raw_gap, new_gap)


def test_no_overlap_empty(spark):
    vals = [1.0] * 20          # all in low bins
    ref = [99.0] * 20          # all in the top bin
    got = histogram_match_sample(
        _df(spark, vals), _df(spark, ref), "v", "k", 0.0, 100.0,
        n_bins=10).count()
    assert got == 0


def test_partition_invariance(spark):
    vals = [(i * 13) % 100 for i in range(300)]
    ref = [(i * 3) % 50 for i in range(200)]
    a = sorted(r["k"] for r in histogram_match_sample(
        _df(spark, vals), _df(spark, ref), "v", "k", 0.0, 100.0).collect())
    b = sorted(r["k"] for r in histogram_match_sample(
        _df(spark, vals).repartition(7), _df(spark, ref).repartition(3),
        "v", "k", 0.0, 100.0).collect())
    assert a == b

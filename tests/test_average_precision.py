"""average_precision: step-sum vs a python mirror of sklearn's
threshold formulation, tie blocks, degenerate, invariance."""
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.experiment import (
    average_precision)


def _df(spark, pairs):
    return spark.createDataFrame(
        [Row(score=s, label=y) for s, y in pairs],
        "score double, label int")


def _mirror(pairs, scale=6):
    agg = {}
    for s, y in pairs:
        if s is None:
            continue
        q = int(s * 10**scale + 0.5) if s >= 0 else -int(
            -s * 10**scale - 0.5)
        import math
        q = math.floor(s * 10**scale + 0.5)
        n, p = agg.get(q, (0, 0))
        agg[q] = (n + 1, p + (1 if y == 1 else 0))
    n_pos = sum(p for _, p in agg.values())
    if n_pos == 0:
        return 0
    tp = cum = 0
    total_u = 0
    for q in sorted(agg, reverse=True):
        n, p = agg[q]
        tp += p
        cum += n
        term = (float(p) * float(tp)) / (float(n_pos) * float(cum))
        total_u += math.floor(term * 1e12 + 0.5)
    return total_u


import math  # noqa: E402


def test_matches_mirror_with_ties(spark):
    pairs = [(0.1, 0), (0.2, 0), (0.2, 1), (0.5, 1), (0.5, 0),
             (0.5, 1), (0.9, 1), (0.9, 0), (0.3, 0), (0.7, 1)]
    got = average_precision(_df(spark, pairs), "score",
                            "label").collect()[0]
    assert got["ap_u"] == _mirror(pairs)
    assert got["ap"] == got["ap_u"] / 1e12
    assert got["n"] == 10 and got["n_pos"] == 5


def test_perfect_ranking_ap_one(spark):
    pairs = [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)]
    got = average_precision(_df(spark, pairs), "score",
                            "label").collect()[0]
    assert got["ap_u"] == 10**12  # AP = 1 exactly


def test_no_positives_null_ap(spark):
    got = average_precision(_df(spark, [(0.5, 0), (0.2, 0)]),
                            "score", "label").collect()[0]
    assert got["ap"] is None and got["ap_u"] == 0


def test_partition_invariance(spark):
    import hashlib
    pairs = []
    for i in range(400):
        s = ((i * 23) % 89) / 89.0
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
        pairs.append((s, 1 if h % 100 < s * 60 + 20 else 0))
    a = average_precision(_df(spark, pairs), "score",
                          "label").collect()[0]
    b = average_precision(_df(spark, pairs).repartition(17), "score",
                          "label").collect()[0]
    assert tuple(a) == tuple(b)
    assert a["ap_u"] == _mirror(pairs)

"""roc_auc: exact rank-based AUC vs a brute-force pair count (the
probabilistic definition), tie handling, degenerate labels, null
conventions, partition invariance."""
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.experiment import roc_auc


def _df(spark, pairs):
    return spark.createDataFrame(
        [Row(score=s, label=y) for s, y in pairs],
        "score double, label int")


def _brute(pairs):
    """AUC = P(score_pos > score_neg) + 0.5·P(equal), exact rational."""
    pos = [s for s, y in pairs if y == 1 and s is not None]
    neg = [s for s, y in pairs if (y != 1 or y is None) and s is not None]
    neg = [s for s, y in pairs if s is not None and y != 1]
    num2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                num2 += 2
            elif p == n:
                num2 += 1
    return num2, 2 * len(pos) * len(neg)


def test_matches_brute_force_with_ties(spark):
    pairs = [(0.1, 0), (0.2, 0), (0.2, 1), (0.5, 1), (0.5, 0),
             (0.5, 1), (0.9, 1), (0.9, 0), (0.3, 0), (0.7, 1)]
    got = roc_auc(_df(spark, pairs), "score", "label").collect()[0]
    num2, den2 = _brute(pairs)
    assert (got["auc_num2"], got["auc_den2"]) == (num2, den2)
    assert got["auc"] == num2 / den2
    assert got["n"] == 10 and got["n_pos"] == 5 and got["n_neg"] == 5


def test_perfect_and_inverted(spark):
    perfect = [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)]
    got = roc_auc(_df(spark, perfect), "score", "label").collect()[0]
    assert got["auc"] == 1.0
    inv = [(s, 1 - y) for s, y in perfect]
    got2 = roc_auc(_df(spark, inv), "score", "label").collect()[0]
    assert got2["auc"] == 0.0


def test_degenerate_single_class_null_auc(spark):
    got = roc_auc(_df(spark, [(0.1, 1), (0.2, 1)]), "score",
                  "label").collect()[0]
    assert got["auc"] is None and got["auc_den2"] == 0


def test_null_conventions(spark):
    pairs = [(None, 1), (0.5, None), (0.5, 1), (0.1, 0)]
    got = roc_auc(_df(spark, pairs), "score", "label").collect()[0]
    # null score dropped; null label counts as negative
    assert got["n"] == 3 and got["n_pos"] == 1 and got["n_neg"] == 2
    num2, den2 = _brute([(0.5, 0), (0.5, 1), (0.1, 0)])
    assert (got["auc_num2"], got["auc_den2"]) == (num2, den2)


def test_partition_invariance(spark):
    import hashlib
    pairs = []
    for i in range(500):
        s = ((i * 31) % 97) / 97.0
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
        pairs.append((s, 1 if h % 100 < s * 70 + 15 else 0))
    a = roc_auc(_df(spark, pairs), "score", "label").collect()[0]
    b = roc_auc(_df(spark, pairs).repartition(13), "score",
                "label").collect()[0]
    assert tuple(a) == tuple(b)
    num2, den2 = _brute(pairs)
    assert (a["auc_num2"], a["auc_den2"]) == (num2, den2)

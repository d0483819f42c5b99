"""concentration: exact-integer HHI / Gini / top-share profile."""

import pytest

from msi_preprocessing_pipeline_spark.operators.profile import concentration

SC = 1_000_000


def _ref(weights):
    ws = sorted(weights)
    n, tw = len(ws), sum(ws)
    if tw == 0:
        return (n, 0, None, None, None)
    hhi = SC * sum(w * w for w in ws) // (tw * tw)
    gini = SC * (2 * sum(i * w for i, w in enumerate(ws, 1))
                 - (n + 1) * tw) // (n * tw)
    return (n, tw, hhi, gini, SC * max(ws) // tw)


def test_matches_python_reference(spark):
    rows = [("a", 10), ("a", 30), ("b", 5), ("c", 55), (None, 7),
            ("d", None)]
    df = spark.createDataFrame(rows, "g string, w long")
    r = concentration(df, "g", "w").collect()[0]
    exp = _ref([40, 5, 55, 7, 0])  # null g is a group; null w counts 0
    assert (r["n_groups"], r["total_weight"], r["hhi_micro"],
            r["gini_micro"], r["top_share_micro"]) == exp


def test_row_count_weight_and_uniform_gini_zero(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)],
                               "g string")
    r = concentration(df, "g").collect()[0]
    # 4 equal groups: HHI = 1/4, Gini = 0, top share = 1/4
    assert (r["n_groups"], r["total_weight"]) == (4, 4)
    assert (r["hhi_micro"], r["gini_micro"]) == (SC // 4, 0)
    assert r["top_share_micro"] == SC // 4


def test_monopoly_and_zero_total(spark):
    df = spark.createDataFrame([("a", 100), ("b", 0)], "g string, w long")
    r = concentration(df, "g", "w").collect()[0]
    assert r["hhi_micro"] == SC and r["top_share_micro"] == SC
    # two groups, one owns all: G = (2*(1*0+2*100) - 3*100)/(2*100) = 1/2
    assert r["gini_micro"] == SC // 2
    z = spark.createDataFrame([("a", 0)], "g string, w long")
    rz = concentration(z, "g", "w").collect()[0]
    assert rz["hhi_micro"] is None and rz["gini_micro"] is None


def test_partition_invariance(spark):
    import random
    rng = random.Random(3)
    rows = [(f"s{rng.randrange(10)}", rng.randrange(1000))
            for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, w long")
    a = concentration(df, "g", "w").collect()[0]
    b = concentration(df.repartition(13), "g", "w").collect()[0]
    assert a == b
    agg = {}
    for g, w in rows:
        agg[g] = agg.get(g, 0) + w
    assert (a["n_groups"], a["total_weight"], a["hhi_micro"],
            a["gini_micro"], a["top_share_micro"]) == _ref(
        list(agg.values()))

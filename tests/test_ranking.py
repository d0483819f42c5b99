"""Bradley–Terry MM fit: exact-grid parity with a pure-Python mirror,
statistical sanity, and partition invariance."""
import math

import pytest
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.ranking import bradley_terry


def _bt_python(contests, iters=8, scale=9):
    """Pure-Python mirror of the operator's quantized MM iteration."""
    sc = 10 ** scale
    n = {}
    w = {}
    items = set()
    for a, b in contests:
        n[(a, b)] = n.get((a, b), 0) + 1
        n[(b, a)] = n.get((b, a), 0) + 1
        w[a] = w.get(a, 0) + 1
        items |= {a, b}
    s = {i: sc for i in items}
    for _ in range(iters):
        ds = {i: 0 for i in items}
        for (i, j), c in n.items():
            ds[i] += math.floor(c / (max(s[i] + s[j], 1) / sc) * sc + 0.5)
        s = {i: (0 if w.get(i, 0) == 0 else
                 math.floor(w[i] / (ds[i] / sc) * sc + 0.5))
             for i in items}
    return s


@pytest.fixture(scope="module")
def contests():
    # a > b > c > d with some upsets; e never wins
    c = []
    c += [("a", "b")] * 7 + [("b", "a")] * 3
    c += [("b", "c")] * 6 + [("c", "b")] * 2
    c += [("c", "d")] * 5 + [("d", "c")] * 1
    c += [("a", "d")] * 4
    c += [("d", "e")] * 3 + [("a", "e")] * 2
    return c


def test_bt_matches_python_mirror_exactly(spark, contests):
    df = spark.createDataFrame([Row(winner=a, loser=b)
                                for a, b in contests])
    got = {r.item: r.s_n for r in
           bradley_terry(df, iters=8, scale=9).collect()}
    assert got == _bt_python(contests, iters=8, scale=9)


def test_bt_orders_by_true_strength_and_pins_no_win_items(spark, contests):
    df = spark.createDataFrame([Row(winner=a, loser=b)
                                for a, b in contests])
    got = {r.item: r.s_n for r in
           bradley_terry(df, iters=16, scale=9).collect()}
    assert got["e"] == 0
    assert got["a"] > got["b"] > got["c"] > got["d"] > 0


def test_bt_partitioning_invariant(spark, contests):
    rows = [Row(winner=a, loser=b) for a, b in contests] * 3
    a = spark.createDataFrame(rows).repartition(1)
    b = spark.createDataFrame(rows).repartition(16)
    ga = sorted((r.item, r.s_n)
                for r in bradley_terry(a, iters=8).collect())
    gb = sorted((r.item, r.s_n)
                for r in bradley_terry(b, iters=8).collect())
    assert ga == gb


def test_bt_rejects_bad_iters(spark):
    df = spark.createDataFrame([Row(winner="a", loser="b")])
    with pytest.raises(ValueError):
        bradley_terry(df, iters=0)

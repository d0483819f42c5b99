"""label_prop: deterministic synchronous label propagation."""

import pytest

from msi_preprocessing_pipeline_spark.operators.graph import label_prop


def _lpa_py(edges, iters):
    adj = {}
    for a, b in edges:
        if a == b or a is None or b is None:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v, ns in adj.items():
            cnt = {}
            for u in ns:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt, key=lambda k: (-cnt[k], k))
        lab = new
    return lab


def _clique(nodes):
    return [(a, b) for a in nodes for b in nodes if a < b]


def test_two_cliques_with_bridge_separate(spark):
    edges = _clique([1, 2, 3, 4]) + _clique([10, 11, 12, 13]) + [(4, 10)]
    df = spark.createDataFrame(edges, "s long, d long")
    got = {r["node"]: r["label"]
           for r in label_prop(df, "s", "d", iters=3).collect()}
    exp = _lpa_py(edges, 3)
    assert got == exp
    # the two cliques end in different communities
    assert len({got[v] for v in (1, 2, 3, 4)}) == 1
    assert len({got[v] for v in (10, 11, 12, 13)}) == 1
    assert got[1] != got[10]


def test_matches_python_on_random_graph_and_partitions(spark):
    import random
    rng = random.Random(11)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(120)})
    df = spark.createDataFrame(edges, "s long, d long")
    exp = _lpa_py(edges, 4)
    got = {r["node"]: r["label"]
           for r in label_prop(df, "s", "d", iters=4).collect()}
    assert got == exp
    got7 = {r["node"]: r["label"]
            for r in label_prop(df.repartition(7), "s", "d",
                                iters=4).collect()}
    assert got7 == exp


def test_drops_self_loops_nulls_and_validates(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (None, 3), (4, None)], "s long, d long")
    got = {r["node"]: r["label"]
           for r in label_prop(df, "s", "d", iters=2).collect()}
    # only the 1-2 edge names nodes
    assert set(got) == {1, 2}
    assert got == {1: 1, 2: 2} or got == {1: 2, 2: 1} or got == {1: 1,
                                                                 2: 1}
    exp = _lpa_py([(1, 2)], 2)
    assert got == exp
    with pytest.raises(ValueError):
        label_prop(df, "s", "d", iters=0)

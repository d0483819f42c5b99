"""temperature_mixture_plan: exact Hamilton allocation vs a python
mirror, budget conservation, sqrt quantization, empty/zero-token
edges, partition invariance."""
import math

from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.sampling import (
    temperature_mixture_plan)


def _mirror(tokens_by_source, budget, scale=10**6):
    q = {s: math.floor(math.sqrt(n) * scale + 0.5)
         for s, n in tokens_by_source.items()}
    Q = sum(q.values())
    if Q == 0:
        return {s: 0 for s in q}
    base = {s: budget * q[s] // Q for s in q}
    rem = {s: budget * q[s] % Q for s in q}
    left = budget - sum(base.values())
    order = sorted(q, key=lambda s: (-rem[s], s))
    for s in order[:left]:
        base[s] += 1
    return base


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(source=s, n_tok=n) for s, n in rows],
        "source string, n_tok int")


def test_matches_mirror_and_conserves_budget(spark):
    rows = [("a", 100), ("a", 300), ("b", 25), ("c", 1), ("d", 7),
            ("e", 7)]
    df = _df(spark, rows)
    got = {r["group"]: r["alloc_docs"]
           for r in temperature_mixture_plan(df, 97).collect()}
    by_src = {}
    for s, n in rows:
        by_src[s] = by_src.get(s, 0) + n
    assert got == _mirror(by_src, 97)
    assert sum(got.values()) == 97


def test_sqrt_quantization_exact(spark):
    df = _df(spark, [("a", 400), ("b", 2)])
    got = {r["group"]: (r["q_temp"], r["weight"])
           for r in temperature_mixture_plan(df, 10).collect()}
    assert got["a"][0] == 20_000_000
    assert got["b"][0] == math.floor(math.sqrt(2) * 1e6 + 0.5)
    q_a, q_b = got["a"][0], got["b"][0]
    assert got["a"][1] == q_a / (q_a + q_b)


def test_zero_token_corpus(spark):
    df = _df(spark, [("a", 0), ("b", 0)])
    got = temperature_mixture_plan(df, 10).collect()
    assert all(r["alloc_docs"] == 0 and r["weight"] is None
               for r in got)


def test_remainder_tie_breaks_by_group(spark):
    # two identical sources, odd budget: the +1 goes to the
    # lexicographically smaller group
    df = _df(spark, [("x", 9), ("y", 9)])
    got = {r["group"]: r["alloc_docs"]
           for r in temperature_mixture_plan(df, 5).collect()}
    assert got == {"x": 3, "y": 2}


def test_partition_invariance(spark):
    rows = [(f"s{i % 5}", (i * 37) % 200) for i in range(40)]
    df = _df(spark, rows)
    a = sorted(map(tuple,
                   temperature_mixture_plan(df, 33).collect()))
    b = sorted(map(tuple,
                   temperature_mixture_plan(df.repartition(11), 33)
                   .collect()))
    assert a == b

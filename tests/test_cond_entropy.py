"""conditional_entropy: per-group bigram H(next|current), exact-nano."""

import math

import pytest

from msi_preprocessing_pipeline_spark.operators.lm import (
    conditional_entropy)


def _h_py(groups):
    out = {}
    for g, docs in groups.items():
        cxy, cx, n = {}, {}, 0
        for toks in docs:
            for a, b in zip(toks, toks[1:]):
                cxy[(a, b)] = cxy.get((a, b), 0) + 1
                cx[a] = cx.get(a, 0) + 1
                n += 1
        if n == 0:
            continue

        def q(c):
            return math.floor(c * math.log(c) * 1e9 + 0.5)

        sx = sum(q(c) for c in cx.values())
        sxy = sum(q(c) for c in cxy.values())
        out[g] = (n, (sx - sxy) // n)
    return out


def test_matches_python_reference_and_null_group(spark):
    groups = {
        "a": [[1, 2, 1, 2, 1, 2], [1, 2, 3]],
        "b": [[5, 6, 7, 8], [9], []],
        None: [[1, 1, 1, 1]],
        "empty": [[4]],  # no bigrams -> no row
    }
    rows = [(g, t) for g, docs in groups.items() for t in docs]
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    got = {r["source"]: (r["n_bigrams"], r["h_cond_nano"])
           for r in conditional_entropy(df, "source").collect()}
    assert got == _h_py(groups)
    assert None in got           # null group survives the join
    assert "empty" not in got
    # deterministic repetition -> H == 0 exactly
    assert got[None] == (3, 0)


def test_template_vs_diverse_and_partition_invariance(spark):
    import random
    rng = random.Random(2)
    template = [("t", [1, 2, 3, 4] * 25) for _ in range(20)]
    diverse = [("d", [rng.randrange(50) for _ in range(100)])
               for _ in range(20)]
    df = spark.createDataFrame(template + diverse,
                               "source string, tokens array<int>")
    got = {r["source"]: r["h_cond_nano"]
           for r in conditional_entropy(df, "source").collect()}
    assert got["t"] < 1_000  # near-zero: fully predictable
    assert got["d"] > 1_000_000_000  # > 1 nat
    g2 = {r["source"]: r["h_cond_nano"]
          for r in conditional_entropy(df.repartition(9),
                                       "source").collect()}
    assert g2 == got
    exp = _h_py({"t": [t for _, t in template],
                 "d": [t for _, t in diverse]})
    assert got == {g: h for g, (_, h) in exp.items()}

"""worst_span: sliding-window bigram-LM quality localization."""

import math

import pytest

from msi_preprocessing_pipeline_spark.operators.lm import worst_span


def _ref(docs, w, k, v):
    cab, ca = {}, {}
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            cab[(a, b)] = cab.get((a, b), 0) + 1
            ca[a] = ca.get(a, 0) + 1
    out = {}
    for i, toks in docs.items():
        qs = [math.floor(math.log((cab[(a, b)] + k) / (ca[a] + k * v))
                         * 1e9 + 0.5)
              for a, b in zip(toks, toks[1:])]
        n = len(qs)
        if n < w:
            continue
        best = None
        for e in range(w - 1, n):  # end index, 0-based
            ssum = sum(qs[e - w + 1:e + 1])
            if best is None or ssum < best[1]:
                best = (e + 1, ssum)  # 1-based end pos
        out[i] = (n, best[0], best[1])
    return out


def test_matches_python_reference(spark):
    import random
    rng = random.Random(4)
    docs = {}
    for i in range(12):
        base = [rng.randrange(6) for _ in range(rng.randrange(3, 40))]
        docs[i] = base
    # doc 50: fluent prefix + a garbage tail that should be the span
    docs[50] = [1, 2] * 20 + [rng.randrange(6000) for _ in range(10)]
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, tokens array<int>")
    w, k, v = 8, 0.5, 8192
    got = {r["doc_id"]: (r["n_bigrams"], r["span_end_pos"],
                         r["span_sum_q9"])
           for r in worst_span(df, w=w, k=k, vocab_size=v).collect()}
    exp = _ref(docs, w, k, v)
    assert got == exp
    # the garbage tail is localized: span ends in the tail region
    assert got[50][1] > 40
    # short docs (fewer than w bigrams) emit no rows
    assert all(len(docs[i]) - 1 >= w for i in got)


def test_partition_invariance_and_args(spark):
    docs = {i: list(range(i, i + 20)) for i in range(8)}
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, tokens array<int>")
    a = sorted(tuple(r) for r in worst_span(df, w=5).collect())
    b = sorted(tuple(r) for r in worst_span(df.repartition(5),
                                            w=5).collect())
    assert a == b
    with pytest.raises(ValueError):
        worst_span(df, w=0)

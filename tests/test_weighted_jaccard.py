"""weighted_jaccard_pairs: exact multiset Jaccard over word k-grams."""

import pytest

from msi_preprocessing_pipeline_spark.operators.dedup import (
    ngram_jaccard_pairs, weighted_jaccard_pairs)


def _grams(text, k):
    ws = text.lower().split()
    if len(ws) < k:
        return [" ".join(ws)]
    return [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]


def _jw_py(docs, k, max_df=None):
    tf = {i: {} for i in docs}
    for i, t in docs.items():
        for g in _grams(t, k):
            tf[i][g] = tf[i].get(g, 0) + 1
    if max_df is not None:
        dfreq = {}
        for i in tf:
            for g in tf[i]:
                dfreq[g] = dfreq.get(g, 0) + 1
        for i in tf:
            tf[i] = {g: c for g, c in tf[i].items()
                     if dfreq[g] <= max_df}
    out = {}
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = tf[ids[x]], tf[ids[y]]
            m = sum(min(c, b[g]) for g, c in a.items() if g in b)
            if m == 0:
                continue
            wa, wb = sum(a.values()), sum(b.values())
            out[(ids[x], ids[y])] = 1_000_000 * m // (wa + wb - m)
    return out


DOCS = {
    1: "the cat sat on the mat today",
    2: "the cat sat on the mat today ok",
    3: "the cat sat on the mat today " * 10,  # repetitive copy
    4: "a completely different sentence here",
}


def test_matches_python_reference(spark):
    df = spark.createDataFrame(list(DOCS.items()),
                               "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["jw_micro"]
           for r in weighted_jaccard_pairs(df, k=3,
                                           threshold=0.0).collect()}
    exp = _jw_py(DOCS, 3)
    assert got == exp


def test_weighted_penalizes_repetition_where_set_does_not(spark):
    df = spark.createDataFrame(list(DOCS.items()),
                               "doc_id long, text string")
    jw = {(r["doc_a"], r["doc_b"]): r["jw_micro"]
          for r in weighted_jaccard_pairs(df, k=3,
                                          threshold=0.0).collect()}
    js = {(r["doc_a"], r["doc_b"]): r["jaccard"]
          for r in ngram_jaccard_pairs(df, k=3, threshold=0.0).collect()}
    # doc 3 = doc 1 repeated 10x: set-Jaccard calls them near-identical,
    # weighted Jaccard sees the multiset mismatch
    assert js[(1, 3)] > 0.7
    assert jw[(1, 3)] < 250_000


def test_threshold_and_hot_cap(spark):
    df = spark.createDataFrame(list(DOCS.items()),
                               "doc_id long, text string")
    hi = {(r["doc_a"], r["doc_b"])
          for r in weighted_jaccard_pairs(df, k=3,
                                          threshold=0.7).collect()}
    assert hi == {(1, 2)}
    # cap at df<=1 drops every shared shingle -> no pairs at all
    assert weighted_jaccard_pairs(df, k=3, threshold=0.0,
                                  max_df=1).count() == 0
    capped = {(r["doc_a"], r["doc_b"]): r["jw_micro"]
              for r in weighted_jaccard_pairs(df, k=3, threshold=0.0,
                                              max_df=2).collect()}
    assert capped == _jw_py(DOCS, 3, max_df=2)


def test_partition_invariance(spark):
    df = spark.createDataFrame(list(DOCS.items()),
                               "doc_id long, text string")
    a = sorted(tuple(r) for r in weighted_jaccard_pairs(
        df, k=3, threshold=0.0).collect())
    b = sorted(tuple(r) for r in weighted_jaccard_pairs(
        df.repartition(7), k=3, threshold=0.0).collect())
    assert a == b

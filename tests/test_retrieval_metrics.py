"""Retrieval metrics: hand-computed golden example, histogram-IDCG ≡
naive-sort IDCG, degenerate denominators, and partition invariance."""
import math

import pytest
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.retrieval import (
    ndcg_discount_units, retrieval_metrics)


def _disc(r):
    return ndcg_discount_units(10)[r - 1]


@pytest.fixture(scope="module")
def tiny(spark):
    # q1: docs ranked 1..5; rel: d1=2, d3=1, d5=1 (plus unretrieved d9=2,
    #     d10=1 -> n_rel=5)
    # q2: no relevant docs at all (rel 0 rows only)
    # q3: judged-relevant exist but none retrieved
    run = spark.createDataFrame(
        [Row(query_id=q, doc_id=d, rank=r)
         for q, docs in [(1, ["d1", "d2", "d3", "d4", "d5"]),
                         (2, ["d1", "d2"]),
                         (3, ["d7", "d8"])]
         for r, d in enumerate(docs, start=1)])
    qrels = spark.createDataFrame(
        [Row(query_id=1, doc_id="d1", rel=2),
         Row(query_id=1, doc_id="d3", rel=1),
         Row(query_id=1, doc_id="d5", rel=1),
         Row(query_id=1, doc_id="d9", rel=2),
         Row(query_id=1, doc_id="d10", rel=1),
         Row(query_id=2, doc_id="d1", rel=0),
         Row(query_id=3, doc_id="d1", rel=1)])
    return run, qrels


def test_hand_computed_metrics(spark, tiny):
    run, qrels = tiny
    out = {r.query_id: r for r in retrieval_metrics(run, qrels, k=10)
           .collect()}
    q1 = out[1]
    assert (q1.n_ret, q1.n_rel, q1.hits) == (5, 5, 3)
    assert q1.precision_at_k == 3 / 10.0
    assert q1.recall_at_k == 3 / 5.0
    assert q1.rr_at_k == 1.0
    # AP@10 = (P@1 + P@3 + P@5)/min(5,10) = (1/1 + 2/3 + 3/5)/5
    lcm = math.lcm(*range(1, 11))
    ap_num = 1 * (lcm // 1) + 2 * (lcm // 3) + 3 * (lcm // 5)
    assert q1.ap_at_k == ap_num / (5 * lcm)
    # DCG = 3*disc(1) + 1*disc(3) + 1*disc(5); ideal grades 2,2,1,1,1
    assert q1.dcg_u == 3 * _disc(1) + _disc(3) + _disc(5)
    idcg = 3 * (_disc(1) + _disc(2)) + sum(_disc(r) for r in (3, 4, 5))
    assert q1.idcg_u == idcg
    assert q1.ndcg_at_k == q1.dcg_u / idcg

    q2 = out[2]  # nothing judged relevant: ratio metrics null, not 0/0
    assert (q2.n_rel, q2.hits, q2.dcg_u, q2.idcg_u) == (0, 0, 0, 0)
    assert q2.recall_at_k is None and q2.ndcg_at_k is None
    assert q2.rr_at_k is None and q2.ap_at_k is None
    assert q2.precision_at_k == 0.0

    q3 = out[3]  # relevant exists but none retrieved: recall/ap/ndcg 0
    assert (q3.n_rel, q3.hits) == (1, 0)
    assert q3.recall_at_k == 0.0 and q3.ndcg_at_k == 0.0
    assert q3.ap_at_k == 0.0 and q3.rr_at_k is None


def test_histogram_idcg_equals_naive_sort(spark):
    # many tied grades across the k boundary — the histogram span
    # formula must equal the sorted-definition IDCG exactly
    k = 5
    rels = [3, 3, 2, 2, 2, 2, 1, 1, 1]          # 9 judged, k=5 cutoff
    qrels = spark.createDataFrame(
        [Row(query_id=1, doc_id=f"d{i}", rel=g)
         for i, g in enumerate(rels)])
    run = spark.createDataFrame([Row(query_id=1, doc_id="d0", rank=1)])
    got = retrieval_metrics(run, qrels, k=k).collect()[0]
    units = ndcg_discount_units(k)
    naive = sum(((1 << g) - 1) * units[i]
                for i, g in enumerate(sorted(rels, reverse=True)[:k]))
    assert got.idcg_u == naive


def test_partition_invariance(spark, tiny):
    run, qrels = tiny
    a = retrieval_metrics(run, qrels, k=10)
    b = retrieval_metrics(run.repartition(13), qrels.repartition(7), k=10)
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(a) == rows(b)


def test_validation_guards(spark, tiny):
    run, qrels = tiny
    with pytest.raises(ValueError, match="lcm"):
        retrieval_metrics(run, qrels, k=41)
    with pytest.raises(ValueError, match="k must be >= 1"):
        retrieval_metrics(run, qrels, k=0)
    with pytest.raises(ValueError, match="overflows"):
        retrieval_metrics(run, qrels, k=10, max_grade=50)

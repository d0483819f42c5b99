"""Span corruption: python mirror parity, sentinel reconstruction
identity, masking-rate/cap behavior, and the map-only plan pin."""
import hashlib

import pytest
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.augment import span_corrupt

V, L, RATE, MS = 1000, 8, 40, 3


def _bucket(key: str, n: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n


def _mirror(doc_id, toks, rate_pct=RATE, slot_len=L, max_span=MS,
            cap=100, seed=7, vocab=V):
    inp, tgt, k = [], [], 0
    n = len(toks)
    for i in range((n + slot_len - 1) // slot_len):
        base = i * slot_len
        sl = min(n - base, slot_len)
        raw = _bucket(f"{doc_id}:sc0:{i}:{seed}", 100) < rate_pct
        if raw and k < cap:
            start = _bucket(f"{doc_id}:sc1:{i}:{seed}", sl)
            span = 1 + _bucket(f"{doc_id}:sc2:{i}:{seed}",
                               min(max_span, sl - start))
            inp += toks[base:base + start] + [vocab + k] \
                + toks[base + start + span:base + sl]
            tgt += [vocab + k] + toks[base + start:base + start + span]
            k += 1
        else:
            inp += toks[base:base + sl]
    n_masked = n - (len(inp) - k)
    return inp, tgt, k, n_masked


@pytest.fixture(scope="module")
def docs(spark):
    rows = [Row(doc_id=i, tokens=list(range(i % 37)))
            for i in range(60)]
    return spark.createDataFrame(rows)


def test_matches_python_mirror(spark, docs):
    out = {r.doc_id: r for r in
           span_corrupt(docs, vocab_size=V, slot_len=L, rate_pct=RATE,
                        max_span=MS).collect()}
    orig = {r.doc_id: r.tokens for r in docs.collect()}
    hit = 0
    for did, toks in orig.items():
        inp, tgt, k, masked = _mirror(did, toks)
        got = out[did]
        assert (got.inputs, got.targets, got.n_spans, got.n_masked) \
            == (inp, tgt, k, masked), did
        hit += k > 0
    assert hit > 10  # corruption actually fires at this rate


def test_reconstruction_identity(spark, docs):
    out = span_corrupt(docs, vocab_size=V, slot_len=L, rate_pct=RATE,
                       max_span=MS).where("n_spans > 0").collect()
    orig = {r.doc_id: r.tokens for r in docs.collect()}
    assert out
    for r in out:
        # split targets at sentinels -> span k follows sentinel V+k
        spans, cur = {}, None
        for t in r.targets:
            if t >= V:
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt = []
        for t in r.inputs:
            rebuilt += spans[t] if t >= V else [t]
        assert rebuilt == orig[r.doc_id], r.doc_id


def test_rate_zero_and_cap(spark, docs):
    none = span_corrupt(docs, vocab_size=V, rate_pct=0)
    assert none.where("n_spans > 0").count() == 0
    rows = none.collect()
    orig = {r.doc_id: r.tokens for r in docs.collect()}
    assert all(r.inputs == orig[r.doc_id] and r.targets == []
               for r in rows)
    capped = span_corrupt(docs, vocab_size=V, rate_pct=100,
                          max_sentinels=2).collect()
    assert max(r.n_spans for r in capped) <= 2
    # the capped run corrupts the FIRST raw-corrupt slots: sentinels 0,1
    for r in capped:
        sents = [t for t in r.targets if t >= V]
        assert sents == [V + i for i in range(len(sents))]


def test_plan_is_map_only(spark, docs):
    from tests.test_plan_shapes import plan_of
    plan = plan_of(span_corrupt(docs, vocab_size=V))
    assert "Exchange" not in plan
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas", "Window"):
        assert node not in plan


def test_guards(spark, docs):
    with pytest.raises(ValueError, match="max_span"):
        span_corrupt(docs, max_span=9, slot_len=8)
    with pytest.raises(ValueError, match="rate_pct"):
        span_corrupt(docs, rate_pct=-1)

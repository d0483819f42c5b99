"""Vocabulary prune + remap: deterministic rank order, arrow/relational
plan parity, unk accounting, null/empty passthrough, coverage math, and
the map-only plan pin for the arrow path."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.vocab import (
    prune_vocab, remap_tokens, vocab_coverage)


def _docs(spark):
    rows = [
        Row(doc_id=1, tokens=[5, 5, 5, 9, 7]),
        Row(doc_id=2, tokens=[5, 9, 9, 11]),
        Row(doc_id=3, tokens=[7, 7, 42]),       # 42 is a singleton
        Row(doc_id=4, tokens=[]),
        Row(doc_id=5, tokens=None),
    ]
    return spark.createDataFrame(
        rows, "doc_id int, tokens array<int>")


def test_prune_vocab_rank_order(spark):
    v = {r["tok"]: (r["c"], r["new_id"])
         for r in prune_vocab(_docs(spark), min_count=2).collect()}
    # counts: 5->4, 9->3, 7->3, 11->1(drop), 42->1(drop)
    assert set(v) == {5, 9, 7}
    assert v[5] == (4, 1)
    # tie 9 vs 7 at c=3 -> smaller token id first
    assert v[7] == (3, 2)
    assert v[9] == (3, 3)


def test_prune_vocab_max_vocab_cap(spark):
    v = prune_vocab(_docs(spark), min_count=1, max_vocab=2)
    assert [r["tok"] for r in v.orderBy("new_id").collect()] == [5, 7]


@pytest.mark.parametrize("strategy", ["arrow", "relational"])
def test_remap_semantics(spark, strategy):
    docs = _docs(spark)
    vocab = prune_vocab(docs, min_count=2)
    out = {r["doc_id"]: (r["remapped"], r["n_unk"])
           for r in remap_tokens(docs, vocab,
                                 strategy=strategy).collect()}
    assert out[1] == ([1, 1, 1, 3, 2], 0)
    assert out[2] == ([1, 3, 3, 0], 1)          # 11 -> unk
    assert out[3] == ([2, 2, 0], 1)             # 42 -> unk
    assert out[4] == ([], 0)
    assert out[5] == (None, 0)
    assert len(out) == 5


def test_remap_plans_row_identical(spark):
    """The zero-shuffle arrow plan and the relational derivation are
    pinned to produce the same relation."""
    docs = _docs(spark)
    vocab = prune_vocab(docs, min_count=2)
    cols = ["doc_id", "remapped", "n_unk"]
    a = remap_tokens(docs, vocab, strategy="arrow").select(cols)
    b = remap_tokens(docs, vocab, strategy="relational").select(cols)
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))


def test_remap_arrow_plan_is_map_only(spark):
    docs = _docs(spark)
    vocab = prune_vocab(docs, min_count=2)
    plan = remap_tokens(docs, vocab, strategy="arrow") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_remap_negative_token_raises(spark):
    docs = spark.createDataFrame([Row(doc_id=1, tokens=[-1, 3])],
                                 "doc_id int, tokens array<int>")
    vocab = prune_vocab(_docs(spark), min_count=2)
    with pytest.raises(Exception):
        remap_tokens(docs, vocab, strategy="arrow").collect()


def test_vocab_cap_guard(spark):
    docs = _docs(spark)
    vocab = prune_vocab(docs, min_count=1)
    with pytest.raises(ValueError, match="cap"):
        remap_tokens(docs, vocab, strategy="arrow", vocab_cap=2)


def test_coverage(spark):
    docs = _docs(spark)
    vocab = prune_vocab(docs, min_count=2)
    row = vocab_coverage(docs, vocab).collect()[0]
    # kept occurrences 4+3+3 = 10 of 12 total
    assert (row["vocab_size"], row["n_tokens"], row["n_covered"]) == \
        (3, 12, 10)
    assert row["coverage_frac"] == pytest.approx(10 / 12)


def test_remap_partition_invariance(spark):
    docs = _docs(spark)
    vocab = prune_vocab(docs, min_count=2)
    one = remap_tokens(docs.coalesce(1), vocab, strategy="arrow")
    many = remap_tokens(docs.repartition(7), vocab, strategy="arrow")
    assert sorted(map(tuple,
                      one.select("doc_id", "remapped").collect())) == \
        sorted(map(tuple,
                   many.select("doc_id", "remapped").collect()))

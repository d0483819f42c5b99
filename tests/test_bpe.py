"""BPE tokenizer fit/encode (operators/bpe.py)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from msi_preprocessing_pipeline_spark.operators.bpe import (
    bpe_segment_word, encode_bpe, fit_bpe, word_frequencies)


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    # classic BPE teaching example: "low lower lowest ..." shapes
    rows = [(1, "low low low lower lower lowest"),
            (2, "low lowest newer newer new")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_frequencies(tiny_corpus):
    wf = {r["word"]: r["freq"]
          for r in word_frequencies(tiny_corpus).collect()}
    assert wf["low"] == 4 and wf["lower"] == 2 and wf["new"] == 1


def test_fit_bpe_matches_hand_computation(tiny_corpus):
    merges = fit_bpe(word_frequencies(tiny_corpus), n_merges=3)
    # 'l'+'o' dominates (lo appears in low/lower/lowest: 4+2+2=8)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")  # then lo+w (same 8 occurrences)
    assert len(merges) == 3


def test_fit_bpe_deterministic_under_repartition(tiny_corpus):
    wf = word_frequencies(tiny_corpus)
    a = fit_bpe(wf, n_merges=8)
    b = fit_bpe(wf.repartition(7), n_merges=8)
    assert a == b


def test_encode_roundtrip_reconstructs_words(tiny_corpus):
    merges = fit_bpe(word_frequencies(tiny_corpus), n_merges=10)
    out = encode_bpe(tiny_corpus, merges).collect()
    originals = {r["doc_id"]: r["text"] for r in tiny_corpus.collect()}
    for r in out:
        # concatenating the symbols and splitting on the end-of-word
        # marker must reproduce the normalized words exactly
        joined = "".join(r["bpe_tokens"])
        words = [w for w in joined.split("</w>") if w]
        assert words == originals[r["doc_id"]].lower().split()


def test_segment_word_uses_merge_ranks():
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("low", "</w>"): 2}
    assert bpe_segment_word("low", ranks) == ["low</w>"]
    assert bpe_segment_word("lox", ranks) == ["lo", "x", "</w>"]
    assert bpe_segment_word("zz", {}) == ["z", "z", "</w>"]


def test_fit_bpe_vocab_cap(tiny_corpus):
    with pytest.raises(ValueError, match="collect_threshold"):
        fit_bpe(word_frequencies(tiny_corpus), n_merges=2,
                collect_threshold=3)


def test_tokenized_table_matches_baseline_shape(tiny_corpus, spark):
    from msi_preprocessing_pipeline_spark.operators.bpe import (
        bpe_vocab, tokenized_table)

    docs = tiny_corpus.withColumn("source", F.lit("srcA"))
    merges = fit_bpe(word_frequencies(docs), n_merges=10)
    out = tokenized_table(docs, merges)
    assert out.schema.simpleString() == \
        "struct<doc_id:bigint,tokens:array<int>,n_tok:int,source:string>"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(r["n_tok"] == len(r["tokens"]) > 0 for r in rows.values())

    # ids decode back to the exact symbol sequence
    enc = {r["doc_id"]: r["bpe_tokens"]
           for r in encode_bpe(docs, merges).collect()}
    vocab = {r["token_id"]: r["symbol"]
             for r in bpe_vocab(encode_bpe(docs, merges)).collect()}
    for d, r in rows.items():
        assert [vocab[t] for t in r["tokens"]] == enc[d]


def test_tokenized_table_unknown_symbol_raises(tiny_corpus, spark):
    from msi_preprocessing_pipeline_spark.operators.bpe import (
        bpe_vocab, tokenized_table)

    merges = fit_bpe(word_frequencies(tiny_corpus), n_merges=5)
    foreign = bpe_vocab(encode_bpe(
        spark.createDataFrame([(9, "zzz qqq")], "doc_id long, text string"),
        merges))
    with pytest.raises(Exception, match="missing from vocab"):
        tokenized_table(tiny_corpus, merges, vocab=foreign).collect()

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

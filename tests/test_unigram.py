"""Unigram-LM tokenizer: census exactness, Viterbi optimality vs brute
force, E-step count identity, fit partition invariance, coverage /
pruning guarantees, tokenize round-trip + unk handling."""
import itertools

from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.bpe import (
    word_frequencies)
from msi_preprocessing_pipeline_spark.operators.unigram import (
    _ZERO_SCORE, fit_unigram, substring_census, unigram_tokenize,
    viterbi_segment)


def _wf(spark, rows):
    return spark.createDataFrame(
        [Row(word=w, freq=f) for w, f in rows],
        "word string, freq long")


def test_substring_census_counts_every_occurrence(spark):
    wf = _wf(spark, [("aab", 2), ("ab", 3)])
    got = {r["piece"]: r["count"]
           for r in substring_census(wf, max_piece_len=2).collect()}
    # 'a': 2 in aab (x2) + 1 in ab (x3) = 7; 'aa': 2; 'ab': 2+3 = 5
    assert got == {"a": 7, "b": 5, "aa": 2, "ab": 5, "aab": 0} or \
        got == {"a": 7, "b": 5, "aa": 2, "ab": 5}
    assert got["a"] == 7 and got["b"] == 5
    assert got["aa"] == 2 and got["ab"] == 5
    assert "aab" not in got  # length 3 > max_piece_len


def _brute_best(word, scores, max_len):
    """Enumerate all segmentations; pick by the operator's tie order."""
    n = len(word)
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pieces, start = [], 0
        ok = True
        for i, c in enumerate(cuts, 1):
            if c:
                pieces.append(word[start:i])
                start = i
        pieces.append(word[start:])
        tot = 0
        for p in pieces:
            if len(p) > max_len:
                ok = False
                break
            s = scores.get(p)
            if s is None:
                if len(p) > 1:
                    ok = False
                    break
                s = _ZERO_SCORE
            tot += s
        if not ok:
            continue
        # DP tie order: score desc, fewer pieces, then the DP's
        # last-piece rule — brute force only checks score/npieces here
        key = (tot, -len(pieces))
        if best is None or key > best[0]:
            best = (key, pieces)
    return best


def test_viterbi_matches_brute_force():
    scores = {"a": -10, "b": -20, "ab": -25, "ba": -22, "aba": -40,
              "bb": -35}
    for word in ["abab", "babba", "aaaa", "abba", "bab"]:
        got = viterbi_segment(word, scores, 3)
        key, _ = _brute_best(word, scores, 3)
        tot = sum(scores.get(p, _ZERO_SCORE) for p in got)
        assert (tot, -len(got)) == key, (word, got, key)
        assert "".join(got) == word


def test_viterbi_unseen_char_singleton():
    got = viterbi_segment("axb", {"a": -1, "b": -1, "ax": -1}, 2)
    # 'ax' has a real score; 'x' alone would take the floor — Viterbi
    # must prefer the scored bigram path
    assert got == ["ax", "b"]
    got2 = viterbi_segment("zz", {"a": -1}, 2)
    assert got2 == ["z", "z"]


def test_fit_partition_invariant_and_pruned(spark):
    rows = [(w, f) for w, f in
            [("the", 50), ("them", 11), ("theme", 7), ("he", 30),
             ("hem", 5), ("banana", 9), ("bandana", 4), ("ana", 13),
             ("nan", 6), ("band", 8)]]
    a = fit_unigram(_wf(spark, rows), vocab_size=6, n_iters=3,
                    max_piece_len=3, max_seed=64)
    b = fit_unigram(_wf(spark, rows).repartition(7), vocab_size=6,
                    n_iters=3, max_piece_len=3, max_seed=64)
    assert a == b
    chars = {c for w, _ in rows for c in w}
    got_pieces = {p.piece for p in a}
    assert chars <= got_pieces  # coverage: every char survives
    assert sum(len(p.piece) > 1 for p in a) <= 6
    # ids are 1-based, dense, ordered by (count desc, piece asc)
    assert [p.piece_id for p in a] == list(range(1, len(a) + 1))
    counts = [(-p.count, p.piece) for p in a]
    assert counts == sorted(counts)


def test_estep_counts_identity(spark):
    """Total piece count must equal Σ freq·|segmentation(word)|."""
    rows = [("abc", 4), ("ab", 6), ("ccc", 2)]
    pieces = fit_unigram(_wf(spark, rows), vocab_size=4, n_iters=2,
                         max_piece_len=2, max_seed=32)
    scores = {p.piece: p.score_u for p in pieces}
    expect = sum(f * len(viterbi_segment(w, scores, 2)) for w, f in rows)
    assert sum(p.count for p in pieces) == expect


def test_tokenize_round_trip_and_unk(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the theme band", source="s"),
         Row(doc_id=2, text=None, source="s"),
         Row(doc_id=3, text="theqz", source="s")],
        "doc_id long, text string, source string")
    wf = word_frequencies(docs.where(F_id_ne(3)))  # fit without doc 3
    pieces = fit_unigram(wf, vocab_size=8, n_iters=2, max_piece_len=3,
                         max_seed=64)
    out = {r["doc_id"]: r for r in
           unigram_tokenize(docs, pieces).collect()}
    by_id = {p.piece_id: p.piece for p in pieces}
    # round trip: decoded pieces concat back to the normalized words
    dec = "".join(by_id[t] for t in out[1]["tokens"])
    assert dec == "thethemeband"
    assert out[2]["tokens"] == [] and out[2]["n_tok"] == 0
    # 'q'/'z' were never fit -> unk id 0 appears
    assert 0 in out[3]["tokens"]
    assert out[1]["n_tok"] == len(out[1]["tokens"])


def F_id_ne(v):
    from pyspark.sql import functions as F
    return F.col("doc_id") != v


def test_tokenize_partition_invariant(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=("banana band " * (i % 3 + 1)).strip(),
             source="s") for i in range(20)],
        "doc_id long, text string, source string")
    pieces = fit_unigram(word_frequencies(docs), vocab_size=6,
                         n_iters=2, max_piece_len=3, max_seed=64)
    a = sorted(map(tuple, unigram_tokenize(docs, pieces).collect()))
    b = sorted(map(tuple,
                   unigram_tokenize(docs.repartition(9), pieces)
                   .collect()))
    assert a == b

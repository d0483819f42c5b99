"""Unit tests for operators.lm (token-LM statistics), operators.sequences
(Markov/recency/trailing features) and drift.mutual_info."""
import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.drift import mutual_info
from msi_preprocessing_pipeline_spark.operators.lm import (
    bigram_counts, context_target_pairs, doc_bigrams, hash_tokenize,
    lm_score, oov_rate, pmi_bigrams, unigram_counts)
from msi_preprocessing_pipeline_spark.operators.sequences import (
    recency_features, trailing_values, transition_counts)


def _bucket(word: str, vocab_size: int, seed: int) -> int:
    return int(hashlib.md5(f"{word}:{seed}".encode()).hexdigest()[:8],
               16) % vocab_size


# ---------------------------------------------------------------------------
# hash_tokenize


def test_hash_tokenize_matches_manual_md5(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="The  quick Fox")])
    [r] = hash_tokenize(df, vocab_size=1000, seed=3).collect()
    assert r.tokens == [_bucket(w, 1000, 3) for w in ("the", "quick", "fox")]
    assert r.n_tok == 3


def test_hash_tokenize_keeps_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="   "),
         Row(doc_id=3, text="a")])
    rows = {r.doc_id: r for r in hash_tokenize(df, vocab_size=10).collect()}
    assert len(rows) == 3
    assert rows[1].tokens == [] and rows[1].n_tok == 0
    assert rows[2].tokens == [] and rows[2].n_tok == 0
    assert rows[3].n_tok == 1


# ---------------------------------------------------------------------------
# bigrams / histograms


def _tok_df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, tokens=t) for i, t in rows],
        "doc_id long, tokens array<int>")


def test_doc_bigrams_positions_and_short_docs(spark):
    df = _tok_df(spark, [(1, [7, 8, 9]), (2, [5]), (3, []), (4, None)])
    got = sorted((r.doc_id, r.pos, r.a, r.b)
                 for r in doc_bigrams(df).collect())
    assert got == [(1, 1, 7, 8), (1, 2, 8, 9)]


def test_bigram_and_unigram_counts(spark):
    df = _tok_df(spark, [(1, [1, 2, 1, 2]), (2, [1, 2])])
    bg = {(r.a, r.b): r.c for r in bigram_counts(df).collect()}
    assert bg == {(1, 2): 3, (2, 1): 1}
    ug = {r.t: r.c for r in unigram_counts(df).collect()}
    assert ug == {1: 3, 2: 3}


# ---------------------------------------------------------------------------
# lm_score


def test_lm_score_hand_computed(spark):
    df = _tok_df(spark, [(1, [1, 2, 1]), (2, [2, 1]), (3, [9])])
    out = {r.doc_id: r for r in
           lm_score(df, k=0.5, vocab_size=4).collect()}
    # corpus bigrams: (1,2):1 (2,1):2 ; first-token counts: c(1)=1, c(2)=2
    p12 = (1 + 0.5) / (1 + 0.5 * 4)
    p21 = (2 + 0.5) / (2 + 0.5 * 4)
    exp1 = math.log(p12) + math.log(p21)
    assert out[1].n_bigrams == 2
    assert out[1].sum_lnp == pytest.approx(exp1, rel=1e-12)
    assert out[1].nll == pytest.approx(-exp1 / 2, rel=1e-12)
    assert out[2].sum_lnp == pytest.approx(math.log(p21), rel=1e-12)
    # single-token doc keeps its row with no score
    assert out[3].n_bigrams == 0
    assert out[3].sum_lnp is None and out[3].nll is None


def test_lm_score_external_counts_unseen_backoff(spark):
    model = _tok_df(spark, [(1, [1, 2])])
    counts = bigram_counts(model)
    score_on = _tok_df(spark, [(10, [3, 4])])  # fully unseen bigram
    [r] = lm_score(score_on, k=0.5, vocab_size=4,
                   counts=counts).collect()
    # c(3,4)=0 and c(3,.)=0 -> P = 0.5 / (0.5*4)
    assert r.sum_lnp == pytest.approx(math.log(0.25), rel=1e-12)


# ---------------------------------------------------------------------------
# kn_score


def test_kn_score_hand_computed(spark):
    from msi_preprocessing_pipeline_spark.operators.lm import kn_score

    df = _tok_df(spark, [(1, [1, 2, 1]), (2, [2, 1]), (3, [9])])
    out = {r.doc_id: r for r in kn_score(df, discount=0.75).collect()}
    # bigram types: (1,2):1, (2,1):2 -> N1+(..)=2
    # N1+(1.)=1, N1+(2.)=1 ; N1+(.2)=1, N1+(.1)=1 ; c(1.)=1, c(2.)=2
    d = 0.75
    p12 = (max(1 - d, 0.0) + (d * 1) * (1 / 2)) / 1
    p21 = (max(2 - d, 0.0) + (d * 1) * (1 / 2)) / 2
    exp1 = math.log(p12) + math.log(p21)
    assert out[1].n_bigrams == 2
    assert out[1].sum_lnp == pytest.approx(exp1, rel=1e-12)
    assert out[1].nll == pytest.approx(-exp1 / 2, rel=1e-12)
    assert out[2].n_bigrams == 1
    assert out[2].sum_lnp == pytest.approx(math.log(p21), rel=1e-12)
    # single-token doc keeps its row with no score
    assert out[3].n_bigrams == 0
    assert out[3].sum_lnp is None and out[3].nll is None


def test_kn_score_matches_pure_python_reference(spark):
    """Operator output equals a from-scratch KN implementation on a
    bigger corpus, and the implied per-context distribution over seen
    continuations stays strictly below 1 (sub-distribution property)."""
    from collections import Counter

    from msi_preprocessing_pipeline_spark.operators.lm import kn_score

    corpus = [(i, [(i * 7 + j * 3) % 5 for j in range((i % 4) + 3)])
              for i in range(12)]
    d = 0.6
    cab = Counter((t[j], t[j + 1]) for _, t in corpus
                  for j in range(len(t) - 1))
    c_a = Counter()
    n1a = Counter()
    n1b = Counter()
    for (a, b), c in cab.items():
        c_a[a] += c
        n1a[a] += 1
        n1b[b] += 1
    n1t = len(cab)

    def p_kn(a, b):
        return ((max(cab[(a, b)] - d, 0.0)
                 + (d * n1a[a]) * (n1b[b] / n1t)) / c_a[a])

    exp = {}
    for i, t in corpus:
        lnps = [math.log(p_kn(t[j], t[j + 1]))
                for j in range(len(t) - 1)]
        exp[i] = (len(lnps), sum(lnps))
    out = {r.doc_id: r for r in
           kn_score(_tok_df(spark, corpus), discount=d).collect()}
    for i, (n, s) in exp.items():
        assert out[i].n_bigrams == n
        assert out[i].sum_lnp == pytest.approx(s, rel=1e-12)
    # sub-distribution: per context a, sum over seen b of P(b|a) < 1
    by_a = Counter()
    for (a, b) in cab:
        by_a[a] += p_kn(a, b)
    for a, tot in by_a.items():
        assert tot < 1.0 + 1e-12


def test_kn_score_partitioning_invariant(spark):
    """Quantized scores must be identical under different partitionings
    (the covariance_embeddings lesson: exact-int sums, no ulp wobble)."""
    from msi_preprocessing_pipeline_spark.operators.lm import kn_score

    rows = [(i, [(i * 13 + j * 5) % 7 for j in range((i % 5) + 2)])
            for i in range(40)]
    a = _tok_df(spark, rows).repartition(1)
    b = _tok_df(spark, rows).repartition(16)
    got_a = sorted((r.doc_id, r.n_bigrams, r.sum_lnp)
                   for r in kn_score(a, scale=9).collect())
    got_b = sorted((r.doc_id, r.n_bigrams, r.sum_lnp)
                   for r in kn_score(b, scale=9).collect())
    assert got_a == got_b


# ---------------------------------------------------------------------------
# pmi


def test_pmi_hand_computed_and_min_count_after_marginals(spark):
    df = _tok_df(spark, [(1, [1, 2, 1, 2, 1, 2]), (2, [1, 3])])
    # bigrams: (1,2)x3, (2,1)x2, (1,3)x1 ; N=6
    out = {(r.a, r.b): r for r in pmi_bigrams(df, min_count=2).collect()}
    assert set(out) == {(1, 2), (2, 1)}  # (1,3) filtered by min_count
    r = out[(1, 2)]
    # marginals computed BEFORE the filter: c_a(1)=4 (includes (1,3))
    assert (r.c, r.c_a, r.c_b) == (3, 4, 3)
    assert r.pmi == pytest.approx(math.log(3 * 6 / (4 * 3)), rel=1e-12)


# ---------------------------------------------------------------------------
# context/target pairs


def test_context_target_pairs_hand(spark):
    df = _tok_df(spark, [(1, [10, 20, 30, 40]), (2, [1, 2])])
    got = sorted((r.doc_id, r.pos, tuple(r.context), r.target)
                 for r in context_target_pairs(df, context_len=2).collect())
    assert got == [(1, 3, (10, 20), 30), (1, 4, (20, 30), 40)]
    # doc 2 has n_tok == context_len -> no full context, no rows


def test_context_target_pairs_validates(spark):
    df = _tok_df(spark, [(1, [1, 2])])
    with pytest.raises(ValueError):
        context_target_pairs(df, context_len=0)


# ---------------------------------------------------------------------------
# oov


def test_oov_rate_counts_occurrences_and_keeps_empty(spark):
    df = _tok_df(spark, [(1, [1, 1, 9]), (2, [])])
    vocab = spark.createDataFrame([Row(t=1)], "t int")
    out = {r.doc_id: r for r in oov_rate(df, vocab).collect()}
    assert (out[1].n_tok, out[1].n_oov) == (3, 1)
    assert out[1].oov_rate == pytest.approx(1 / 3)
    assert (out[2].n_tok, out[2].n_oov) == (0, 0)
    assert out[2].oov_rate is None


# ---------------------------------------------------------------------------
# sequences


def test_transition_counts_hand(spark):
    df = spark.createDataFrame(
        [Row(u=1, ts=1, t="a"), Row(u=1, ts=2, t="b"),
         Row(u=1, ts=3, t="a"), Row(u=2, ts=1, t="b"),
         Row(u=2, ts=2, t="a")],
        "u long, ts long, t string")
    out = {(r.from_type, r.to_type): r
           for r in transition_counts(df, "u", "t", "ts").collect()}
    # user1: a->b, b->a ; user2: b->a  (first events contribute nothing)
    assert {(k, v.n) for k, v in out.items()} == {
        (("a", "b"), 1), (("b", "a"), 2)}
    assert out[("b", "a")].p == pytest.approx(1.0)


def test_transition_counts_null_type_is_a_state(spark):
    df = spark.createDataFrame(
        [Row(u=1, ts=1, t=None), Row(u=1, ts=2, t="x")],
        "u long, ts long, t string")
    out = [(r.from_type, r.to_type, r.n, r.p)
           for r in transition_counts(df, "u", "t", "ts").collect()]
    assert out == [(None, "x", 1, 1.0)]


def test_recency_features_hand(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [Row(u=1, k="a", ts=base),
         Row(u=1, k="a", ts=base + dt.timedelta(seconds=90)),
         Row(u=1, k="b", ts=base + dt.timedelta(seconds=30))],
        "u long, k string, ts timestamp")
    out = sorted(((r.u, r.k, r.secs_since_prev, r.n_prior)
                  for r in recency_features(df, ["u", "k"], "ts").collect()),
                 key=lambda t: (t[0], t[1], t[3]))
    assert out == [(1, "a", None, 0), (1, "a", 90, 1), (1, "b", None, 0)]


def test_trailing_values_null_shortens_not_shifts(spark):
    df = spark.createDataFrame(
        [Row(u=1, ts=1, v=10.0), Row(u=1, ts=2, v=None),
         Row(u=1, ts=3, v=30.0), Row(u=1, ts=4, v=40.0)],
        "u long, ts long, v double")
    out = {r.ts: list(r.v_hist) for r in trailing_values(
        df, "v", "u", "ts", k=2, out_col="v_hist").collect()}
    assert out[1] == []
    assert out[2] == [10.0]
    # frame is rows (2,3): the null at ts=2 is skipped, NOT replaced by
    # the older ts=1 value
    assert out[3] == [10.0]
    assert out[4] == [30.0]


def test_trailing_values_validates_k(spark):
    df = spark.createDataFrame([Row(u=1, ts=1, v=1.0)],
                               "u long, ts long, v double")
    with pytest.raises(ValueError):
        trailing_values(df, "v", "u", "ts", k=0)


# ---------------------------------------------------------------------------
# mutual information


def test_mutual_info_hand_2x2(spark):
    # contingency: (a,0):30 (a,1):10 (b,0):10 (b,1):30, n=80
    rows = ([Row(x="a", y=0)] * 30 + [Row(x="a", y=1)] * 10
            + [Row(x="b", y=0)] * 10 + [Row(x="b", y=1)] * 30)
    df = spark.createDataFrame(rows, "x string, y int")
    [r] = mutual_info(df, "x", "y").collect()
    assert (r.n, r.n_x, r.n_y, r.dof) == (80, 2, 2, 1)
    mi = sum((o / 80) * math.log(o * 80 / (40 * 40))
             for o in (30, 10, 10, 30))
    chi2 = sum((o - 20) ** 2 / 20 for o in (30, 10, 10, 30))
    assert r.mi == pytest.approx(mi, rel=1e-12)
    assert r.chi2 == pytest.approx(chi2, rel=1e-12)


def test_mutual_info_independent_is_zero_and_null_is_state(spark):
    rows = [Row(x=x, y=y) for x in ("a", "b", None) for y in (0, 1)] * 5
    df = spark.createDataFrame(rows, "x string, y int")
    [r] = mutual_info(df, "x", "y").collect()
    assert (r.n_x, r.n_y, r.dof) == (3, 2, 2)  # null x is a state
    assert r.mi == pytest.approx(0.0, abs=1e-12)
    assert r.chi2 == pytest.approx(0.0, abs=1e-12)


def test_mutual_info_unobserved_cell_in_chi2(spark):
    # (a,0):5 (b,1):5 -> cells (a,1),(b,0) unobserved but e=2.5 each
    rows = [Row(x="a", y=0)] * 5 + [Row(x="b", y=1)] * 5
    df = spark.createDataFrame(rows, "x string, y int")
    [r] = mutual_info(df, "x", "y").collect()
    assert r.chi2 == pytest.approx(10.0, rel=1e-12)  # perfect association
    assert r.mi == pytest.approx(math.log(2), rel=1e-12)


# ---------------------------------------------------------------------------
# similar_doc_pairs (all-pairs TF-IDF cosine)


def test_similar_doc_pairs_matches_brute_force(spark):
    """Pair set and quantized cosines equal an independent pure-Python
    TF-IDF implementation with the same integer weighting."""
    from msi_preprocessing_pipeline_spark.operators.lm import (
        similar_doc_pairs)

    corpus = [(i, [(i * 3 + j) % 6 for j in range((i % 4) + 2)] + [0])
              for i in range(14)]
    got = {(r.id_a, r.id_b): (r.n_shared, r.dot, r.cos_u)
           for r in similar_doc_pairs(
               _tok_df(spark, corpus), threshold=0.1,
               max_df=1000).collect()}

    from collections import Counter
    n = len(corpus)
    tfs = {i: Counter(t) for i, t in corpus}
    dfc = Counter(t for _, tf in tfs.items() for t in tf)
    w = {i: {t: c * math.floor(
            math.log((n + 1) / (dfc[t] + 1) + 1.0) * 1e3 + 0.5)
         for t, c in tf.items()} for i, tf in tfs.items()}
    exp = {}
    for a in range(n):
        for b in range(a + 1, n):
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            na = math.sqrt(sum(v * v for v in w[a].values()))
            nb = math.sqrt(sum(v * v for v in w[b].values()))
            cos_u = math.floor(dot / (na * nb) * 1e6 + 0.5)
            if cos_u >= math.floor(0.1 * 1e6 + 0.5):
                exp[(a, b)] = (len(shared), dot, cos_u)
    assert got == exp
    assert len(exp) > 10  # non-vacuous


def test_similar_doc_pairs_max_df_prunes_vocabulary_and_norms(spark):
    """A term over max_df must vanish from dots AND norms (the measure
    lives in the pruned space)."""
    from msi_preprocessing_pipeline_spark.operators.lm import (
        similar_doc_pairs)

    # token 9 is in every doc (df=3 > max_df=2) and must be ignored;
    # docs 1/2 share only token 9 -> no pair at all
    corpus = [(1, [9, 1, 1]), (2, [9, 2]), (3, [9, 1, 2])]
    got = {(r.id_a, r.id_b): r for r in similar_doc_pairs(
        _tok_df(spark, corpus), threshold=0.01, max_df=2).collect()}
    assert set(got) == {(1, 3), (2, 3)}
    # with token 9 pruned, doc 1 = {1:2}, doc 3 = {1:1, 2:1}: the
    # cosine is 2*w1^2 / (2*w1 * sqrt(w1^2+w2^2)); idf equal for both
    # terms so cos = 1/sqrt(2)
    assert got[(1, 3)].cos_u == pytest.approx(707107, abs=1)


def test_kn_score_external_counts_oov_accounting(spark):
    """Under an external model: unseen PAIR of seen words gets the
    continuation mass; bigrams with unseen context or continuation are
    counted as OOV and excluded from nll, never silently dropped."""
    from msi_preprocessing_pipeline_spark.operators.lm import (
        bigram_counts, kn_score)

    model = _tok_df(spark, [(1, [1, 2, 1, 3])])   # bigrams 12,21,13
    counts = bigram_counts(model)
    # doc 10: (1,2) seen; (2,1) seen; (1,9) unseen continuation -> oov;
    # (9,3) unseen context -> oov; (3,?) none
    score_on = _tok_df(spark, [(10, [1, 2, 1, 9, 3]), (11, [9])])
    out = {r.doc_id: r for r in
           kn_score(score_on, discount=0.5, counts=counts).collect()}
    r = out[10]
    assert r.n_bigrams == 4 and r.n_oov_bigrams == 2
    # model marginals: cab={12:1,21:1,13:1}; c_a(1)=2,n1a(1)=2;
    # c_a(2)=1,n1a(2)=1; n1b(2)=1,n1b(1)=1,n1b(3)=1; n1t=3
    d = 0.5
    p12 = (max(1 - d, 0) + (d * 2) * (1 / 3)) / 2
    p21 = (max(1 - d, 0) + (d * 1) * (1 / 3)) / 1
    exp = math.log(p12) + math.log(p21)
    assert r.sum_lnp == pytest.approx(exp, rel=1e-12)
    assert r.nll == pytest.approx(-exp / 2, rel=1e-12)  # over 2 scored
    assert out[11].n_bigrams == 0 and out[11].nll is None


def test_kn_score_external_counts_unseen_pair_of_seen_words(spark):
    """(2,3): both words known to the model, pair unseen -> pure
    continuation mass, not OOV."""
    from msi_preprocessing_pipeline_spark.operators.lm import (
        bigram_counts, kn_score)

    model = _tok_df(spark, [(1, [1, 2, 1, 3])])
    [r] = kn_score(_tok_df(spark, [(10, [2, 3])]), discount=0.5,
                   counts=bigram_counts(model)).collect()
    assert r.n_bigrams == 1 and r.n_oov_bigrams == 0
    # c(2,3)=0; c_a(2)=1, n1a(2)=1; n1b(3)=1; n1t=3
    p = (0.0 + (0.5 * 1) * (1 / 3)) / 1
    assert r.sum_lnp == pytest.approx(math.log(p), rel=1e-12)


# ---------------------------------------------------------------------------
# SAX symbolization


def test_sax_symbols_hand_case(spark):
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.sequences import (
        sax_breakpoints, sax_symbols)

    # 8 points, 4 segments of 2: means 1.5, 3.5, 5.5, 7.5
    rows = [("u", i, i, float(i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "user_id string, event_id long, "
                                     "ms long, value double")
    out = {r.segment: r for r in sax_symbols(
        df, "value", "user_id", "ms", n_segments=4, alphabet_size=4,
        scale=3, tiebreak=["event_id"]).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    vals = np.arange(1, 9, dtype=float)
    mu, sd = vals.mean(), vals.std()  # population sigma
    bps = sax_breakpoints(4)
    for seg, r in out.items():
        paa = vals[2 * seg:2 * seg + 2].mean()
        z = (paa - mu) / sd
        assert r.n_in_seg == 2
        assert r.z_u == int(np.floor(z * 1e6 + 0.5))
        assert r.symbol == sum(z > b for b in bps)
    # monotone series → monotone symbols, extremes in the outer letters
    assert out[0].symbol == 0 and out[3].symbol == 3


def test_sax_symbols_constant_and_short(spark):
    from msi_preprocessing_pipeline_spark.operators.sequences import (
        sax_symbols)

    rows = [("c", i, i, 5.0) for i in range(4)] + [("s", 0, 0, 1.0)]
    df = spark.createDataFrame(rows, "user_id string, event_id long, "
                                     "ms long, value double")
    out = sax_symbols(df, "value", "user_id", "ms", n_segments=8,
                      alphabet_size=4, tiebreak=["event_id"]).collect()
    by = {(r.user_id, r.segment): r for r in out}
    # constant series: sigma 0 → null z/symbol, segments still present
    assert all(by[("c", s)].z_u is None and by[("c", s)].symbol is None
               for s in {seg for u, seg in by if u == "c"})
    # single-point series: one segment (0), sigma 0 → null
    s_rows = [(u, s) for u, s in by if u == "s"]
    assert s_rows == [("s", 0)]


def test_sax_symbols_partition_invariant(spark):
    import numpy as np

    from msi_preprocessing_pipeline_spark.operators.sequences import (
        sax_symbols)

    rng = np.random.default_rng(41)
    rows = [(f"u{i % 6}", i, int(rng.integers(0, 9999)),
             float(rng.normal(50, 20))) for i in range(500)]
    df = spark.createDataFrame(rows, "user_id string, event_id long, "
                                     "ms long, value double")
    run = lambda d: sorted(map(tuple, sax_symbols(  # noqa: E731
        d, "value", "user_id", "ms", tiebreak=["event_id"]).collect()))
    assert run(df.repartition(1)) == run(df.repartition(13))


# ---------------------------------------------------------------------------
# markov_score


def test_markov_score_lockstep_mirror_and_anomaly(spark):
    import math

    from collections import Counter

    from msi_preprocessing_pipeline_spark.operators.sequences import (
        markov_score)

    # 8 "normal" users walk A->B->C->A…; 1 bot walks C->B->A->C…
    rows = []
    for u in range(8):
        for i, t in enumerate("ABC" * 4):
            rows.append((f"u{u}", i, i, t))
    for i, t in enumerate("CBA" * 4):
        rows.append(("bot", i, i, t))
    df = spark.createDataFrame(rows, "user_id string, event_id long, "
                                     "ms long, event_type string")
    got = {r.user_id: (r.n_trans, r.sum_q9, r.mean_q9)
           for r in markov_score(df, "event_type", "user_id", "ms",
                                 tiebreak=["event_id"]).collect()}

    seqs = {}
    for u, _, ms, t in rows:
        seqs.setdefault(u, []).append((ms, t))
    bigs = []
    for u, evs in seqs.items():
        ts = [t for _, t in sorted(evs)]
        bigs += [(u, a, b) for a, b in zip(ts, ts[1:])]
    cab = Counter((a, b) for _, a, b in bigs)
    ca = Counter()
    for (a, _), c in cab.items():
        ca[a] += c
    V = 3.0
    exp = {}
    for u in seqs:
        qs = [int(math.floor(
            math.log((cab[(a, b)] + 0.5) / (ca[a] + 0.5 * V))
            * 1e9 + 0.5)) for uu, a, b in bigs if uu == u]
        s = sum(qs)
        mean = abs(s) // len(qs) * (1 if s >= 0 else -1)
        exp[u] = (len(qs), s, mean)
    assert got == exp
    # the bot's walk is rarer than the normal walk
    assert got["bot"][2] < got["u0"][2]


def test_markov_score_edges(spark):
    from msi_preprocessing_pipeline_spark.operators.sequences import (
        markov_score)

    rows = [("a", 1, 1, "X"),                 # single event: no row
            ("b", 1, 1, "X"), ("b", 2, 2, None),  # null type dropped
            ("b", 3, 3, "Y"),
            ("c", 1, None, "X"), ("c", 2, 2, "Y")]  # null ts dropped
    df = spark.createDataFrame(rows, "user_id string, event_id long, "
                                     "ms long, event_type string")
    got = {r.user_id: r.n_trans for r in markov_score(
        df, "event_type", "user_id", "ms",
        tiebreak=["event_id"]).collect()}
    assert got == {"b": 1}  # only b has an ordered pair left

"""Dedup sketch behavior on a corpus with planted near-duplicates, and
LSH top-k recall against exact brute force."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators import dedup, similarity

BASE = ("the quick brown fox jumps over the lazy dog while the merge join "
        "scans the sorted partition and the window frame slides over rows "
        "of the columnar table with vectorized batch execution and late "
        "materialization in the scan operator pipeline")


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(33)
    words = BASE.split()
    rows = []
    # 10 clusters: one original + 2 near-dups (small edits); 30 random docs
    for c in range(10):
        shuffled = list(words)
        rng.shuffle(shuffled)
        original = " ".join(shuffled)
        rows.append((f"c{c}-orig", original))
        for v in range(2):
            edited = shuffled.copy()
            for _ in range(2):  # two word substitutions ≈ 95% shingle overlap
                edited[rng.randint(len(edited))] = f"tok{rng.randint(999)}"
            rows.append((f"c{c}-dup{v}", " ".join(edited)))
    vocab = list({*words, *(f"w{i}" for i in range(200))})
    for i in range(30):
        rows.append((f"rand-{i:02d}",
                     " ".join(rng.choice(vocab, size=40))))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf)


def _cluster(a: str) -> str:
    return a.split("-")[0]


def test_minhash_lsh_finds_planted_dups(corpus):
    sigs = dedup.minhash_signatures(corpus, n_hashes=128, shingle_words=3)
    pairs = dedup.minhash_lsh_pairs(sigs, bands=32, threshold=0.5).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    # every orig↔dup pair (true Jaccard ≈ .75-.85) must surface; dup↔dup
    # pairs sit near the .5 threshold so most but not necessarily all appear
    for c in range(10):
        for v in range(2):
            pair = tuple(sorted((f"c{c}-orig", f"c{c}-dup{v}")))
            assert pair in found, pair
    for a, b in found:
        assert _cluster(a) == _cluster(b), f"false positive {a}~{b}"
    assert len(found) >= 26  # 20 orig-dup + most of the 10 dup-dup


def test_simhash_finds_planted_dups(corpus):
    # SimHash is a bag-of-words sketch: permutations of the SAME words hash
    # identically, so planted dups (2-word edits) sit at tiny Hamming
    # distance; docs sharing vocabulary also land close — assert recall of
    # the planted pairs and that planted pairs are closer than average
    hashes = dedup.simhash64(corpus)
    pairs = dedup.simhash_near_pairs(hashes, max_hamming=6).toPandas()
    found = {tuple(sorted((a, b))): h
             for a, b, h in zip(pairs.doc_a, pairs.doc_b, pairs.hamming)}
    for c in range(10):
        for v in range(2):
            pair = tuple(sorted((f"c{c}-orig", f"c{c}-dup{v}")))
            assert pair in found and found[pair] <= 6, pair


def test_ngram_jaccard_exact_pairs(corpus):
    pairs = dedup.ngram_jaccard_pairs(corpus, k=3, threshold=0.5).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert all(_cluster(a) == _cluster(b) for a, b in found)
    assert len(found) >= 25


def test_dedup_exact_keeps_one_per_group(spark):
    pdf = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["same text", "same text", "other", "same text"],
    })
    df = spark.createDataFrame(pdf)
    out = dedup.dedup_exact(df, F.md5(F.col("text").cast("binary")),
                            tiebreak="doc_id").toPandas()
    kept = set(out[out.is_kept]["doc_id"])
    assert kept == {"a", "c"}


def test_lsh_topk_recall_vs_exact(spark):
    # random 64-dim embeddings are near-worst-case for sign-LSH (neighbors
    # are barely above ambient similarity); with 4-bit buckets + 1-bit
    # multiprobe the candidate set is ~31% of the corpus, so recall must
    # comfortably beat that baseline while scanning a fraction of pairs
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=10).toPandas()
    approx = similarity.lsh_topk(emb, queries, k=10, lsh_bits=4).toPandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.45, recalls
    # approximate ranks must be internally consistent (exact cosine re-rank)
    assert (approx.groupby("query_id")["rank"].max() <= 10).all()


def test_ivf_topk_recall_and_determinism(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    cents = similarity.ivf_fit_centroids(emb, n_centroids=8, iters=8)
    cents2 = similarity.ivf_fit_centroids(emb, n_centroids=8, iters=8)
    np.testing.assert_array_equal(cents, cents2)  # seeded determinism
    exact = similarity.cosine_topk(emb, queries, k=10).toPandas()
    approx = similarity.ivf_topk(emb, queries, cents, k=10,
                                 n_probe=3).toPandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        recalls.append(len(e & a) / len(e))
    # 3 of 8 lists probed → ~37% of corpus scanned; recall must beat that
    assert np.mean(recalls) >= 0.45, recalls


def test_winnowing_fingerprints(corpus):
    fps = dedup.winnowing_fingerprints(corpus, k=5, window=4)
    pairs = dedup.fingerprint_overlap_pairs(fps, min_common=5).toPandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    # planted dup pairs share most fingerprints
    for c in range(10):
        for v in range(2):
            assert tuple(sorted((f"c{c}-orig", f"c{c}-dup{v}"))) in found
    # winnowing guarantee: identical docs share ALL fingerprints —
    # determinism check
    fps2 = dedup.winnowing_fingerprints(corpus, k=5, window=4)
    a = fps.toPandas().groupby("doc_id")["fingerprint"].apply(frozenset)
    b = fps2.toPandas().groupby("doc_id")["fingerprint"].apply(frozenset)
    assert (a == b).all()


def test_embedding_near_dup_lsh_vs_exact_subset(spark):
    # LSH near-dup pairs must be a SUBSET of exact pairs (no false positives
    # because cosine is verified exactly inside buckets)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lsh_pairs = dedup.embedding_near_dup(emb, threshold=0.3,
                                         lsh_bits=4).toPandas()
    from msi_preprocessing_pipeline_spark.functions import cosine_expr
    left = emb.select(F.col("vec_id").alias("id_a"),
                      F.col("embedding").alias("v_a"))
    right = emb.select(F.col("vec_id").alias("id_b"),
                       F.col("embedding").alias("v_b"))
    exact = (left.crossJoin(right).where(F.col("id_a") < F.col("id_b"))
             .withColumn("cosine", F.round(cosine_expr("v_a", "v_b"), 6))
             .where(F.col("cosine") >= 0.3)
             .select("id_a", "id_b").toPandas())
    exact_set = {(a, b) for a, b in zip(exact.id_a, exact.id_b)}
    lsh_set = {(a, b) for a, b in zip(lsh_pairs.id_a, lsh_pairs.id_b)}
    assert lsh_set <= exact_set
    assert len(lsh_set) > 0


def test_simhash_chunk_pair_bucketing_is_complete(corpus):
    # the hd 4-7 path buckets on chunk PAIRS (h+2 chunks); completeness:
    # every pair within the radius must surface — verify against brute force
    hashes = dedup.simhash64(corpus).toPandas()
    vals = dict(zip(hashes.doc_id, hashes.simhash))
    expected = set()
    ids = sorted(vals)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            hd = bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1")
            if hd <= 6:
                expected.add((min(a, b), max(a, b)))
    got_df = dedup.simhash_near_pairs(
        corpus.sparkSession.createDataFrame(hashes), max_hamming=6).toPandas()
    got = {tuple(sorted((a, b))) for a, b in zip(got_df.doc_a, got_df.doc_b)}
    assert got == expected


def test_simhash_single_chunk_path_complete(corpus):
    hashes = dedup.simhash64(corpus).toPandas()
    vals = dict(zip(hashes.doc_id, hashes.simhash))
    expected = set()
    ids = sorted(vals)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            hd = bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1")
            if hd <= 3:
                expected.add((min(a, b), max(a, b)))
    got_df = dedup.simhash_near_pairs(
        corpus.sparkSession.createDataFrame(hashes), max_hamming=3).toPandas()
    got = {tuple(sorted((a, b))) for a, b in zip(got_df.doc_a, got_df.doc_b)}
    assert got == expected


def test_hot_key_guard_drops_ubiquitous_shingles(spark):
    # plant one boilerplate sentence in EVERY doc: without the df cap it
    # creates a quadratic candidate bucket; with the cap the shingle relation
    # loses exactly the ubiquitous keys and unrelated docs stop pairing up
    import numpy as np
    rng = np.random.RandomState(7)
    boiler = "this content is licensed under the same terms for all users"
    rows = [(f"d{i:03d}",
             " ".join(rng.choice([f"u{i}w{j}" for j in range(30)], size=25))
             + " " + boiler)
            for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sh_all = dedup.word_shingles(df, k=5)
    capped = dedup.drop_hot_keys(sh_all, "shingle", max_df=10)
    hot_remaining = (capped.groupBy("shingle").count()
                     .where(F.col("count") > 10).count())
    assert hot_remaining == 0
    assert capped.count() < sh_all.count()
    # uncapped: every doc pairs with every other through the boilerplate
    uncapped_pairs = dedup.ngram_jaccard_pairs(df, k=5, threshold=0.0)
    capped_pairs = dedup.ngram_jaccard_pairs(df, k=5, threshold=0.0,
                                             max_df=10)
    assert uncapped_pairs.count() == 40 * 39 // 2
    assert capped_pairs.count() == 0


def test_connected_components_recovers_planted_clusters(corpus):
    sigs = dedup.minhash_signatures(corpus, n_hashes=128, shingle_words=3)
    pairs = dedup.minhash_lsh_pairs(sigs, bands=32, threshold=0.5)
    clusters = dedup.connected_components(pairs).toPandas()
    by_cluster = clusters.groupby("cluster_id")["doc_id"].apply(set)
    planted = {f"c{c}": {f"c{c}-orig", f"c{c}-dup0", f"c{c}-dup1"}
               for c in range(10)}
    for c, members in planted.items():
        found = [m for m in by_cluster if set(m) if c in str(m)]
        # the cluster containing this group's min id must hold all 3 docs
        rep = min(members)
        assert rep in by_cluster.index, c
        assert by_cluster[rep] == members, (c, by_cluster[rep])
    # cluster_id is always the component minimum
    assert (clusters.groupby("cluster_id")["doc_id"].min()
            == clusters.cluster_id.drop_duplicates().sort_values().values).all()


def test_star_cap_bounds_giant_cluster_candidates(spark):
    import pandas as pd
    text = ("exactly identical boilerplate document repeated many times "
            "across the corpus with the same words in the same order")
    rows = [(f"dup-{i:03d}", text) for i in range(50)]
    rows += [(f"uniq-{i}", f"unique document number {i} with words "
              f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
             for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sigs = dedup.minhash_signatures(df, n_hashes=64, shingle_words=3)
    full = dedup.minhash_lsh_pairs(sigs, bands=16, threshold=0.5)
    starred = dedup.minhash_lsh_pairs(sigs, bands=16, threshold=0.5,
                                      star_over=5)
    n_full, n_star = full.count(), starred.count()
    assert n_full == 50 * 49 // 2      # the quadratic blow-up
    assert n_star == 49                # star edges only
    # connectivity (the dedup outcome) is identical
    c_full = dedup.connected_components(full).toPandas()
    c_star = dedup.connected_components(starred).toPandas()
    assert (c_full.sort_values("doc_id").cluster_id.values
            == c_star.sort_values("doc_id").cluster_id.values).all()
    assert set(c_star[c_star.cluster_id == "dup-000"].doc_id) \
        == {f"dup-{i:03d}" for i in range(50)}


def test_connected_components_paths_identical(corpus):
    # the scale-adaptive driver union-find and the distributed min-label
    # loop must produce identical assignments
    sigs = dedup.minhash_signatures(corpus, n_hashes=64, shingle_words=3)
    pairs = dedup.minhash_lsh_pairs(sigs, bands=16, threshold=0.5).persist()
    fast = dedup.connected_components(pairs).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    dist = dedup.connected_components(pairs, collect_threshold=0).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert fast.equals(dist)
    assert len(fast) > 0


def test_connected_components_long_chain_converges(spark):
    """A 600-node path (diameter ≫ 25) through the DISTRIBUTED branch:
    pointer jumping must converge within the default max_iter (O(log D)
    rounds), where plain min-label propagation would need 600."""
    from msi_preprocessing_pipeline_spark.operators import dedup
    n = 600
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], schema="doc_a long, doc_b long")
    got = (dedup.connected_components(pairs, collect_threshold=0)
           .toPandas())
    assert len(got) == n
    assert set(got.cluster_id) == {0}


def test_connected_components_nonconvergence_raises(spark):
    from msi_preprocessing_pipeline_spark.operators import dedup
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], schema="doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="max_iter"):
        dedup.connected_components(pairs, collect_threshold=0, max_iter=2)


def test_word_shingles_null_and_empty_text(spark):
    """Null text emits no grams (SQL-oracle semantics; NGram's Scala UDF
    would NPE on a null array without the guard); empty text emits one
    empty gram like the SQL split semantics."""
    df = spark.createDataFrame([(0, "a b c d e f"), (1, None), (2, "")],
                               "doc_id long, text string")
    got = sorted((r[0], r[1])
                 for r in dedup.word_shingles(df, k=5).collect())
    assert got == [(0, "a b c d e"), (0, "b c d e f"), (2, "")]

"""MMR diversified re-rank: pure-python greedy parity, λ=100 ≡ relevance
order, diversity property, and partition invariance."""
import numpy as np
import pytest
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.retrieval import mmr_rerank


def _vecs(n, d=8, seed=5):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d).astype(np.float32)
    # inject near-duplicate clusters so diversity has something to avoid
    X[10] = X[1] + 0.01 * rng.randn(d).astype(np.float32)
    X[11] = X[1] + 0.01 * rng.randn(d).astype(np.float32)
    X[12] = X[2] + 0.01 * rng.randn(d).astype(np.float32)
    return X


def _mirror(X, qid, cand_ids, k, lam_pct, scale=6):
    """Pure-python MMR over the candidate pool (ids sorted asc)."""
    q = np.floor(X.astype(np.float64) * 10 ** scale + 0.5).astype(np.int64)

    def cos_q(a, b):
        dot = int((q[a] * q[b]).sum())
        n2a, n2b = int((q[a] ** 2).sum()), int((q[b] ** 2).sum())
        return int(np.floor(dot / (np.sqrt(float(n2a)) * np.sqrt(float(n2b)))
                            * 1e9 + 0.5))

    ids = sorted(cand_ids)
    rel = {d: cos_q(qid, d) for d in ids}
    maxsim = {d: 0 for d in ids}
    lam, mu = lam_pct, 100 - lam_pct
    out, avail = [], set(ids)
    for r in range(1, min(k, len(ids)) + 1):
        # id-asc tie-break: pick min id among max scores
        smax = max(lam * rel[d] - mu * maxsim[d] for d in avail)
        best = min(d for d in avail
                   if lam * rel[d] - mu * maxsim[d] == smax)
        out.append((r, best, smax))
        avail.discard(best)
        for d in avail:
            maxsim[d] = max(maxsim[d], cos_q(d, best))
    return out


@pytest.fixture(scope="module")
def emb_df(spark):
    X = _vecs(30)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in X[i]])
         for i in range(len(X))])
    return df, X


def test_matches_python_mirror(spark, emb_df):
    df, X = emb_df
    queries = df.where("vec_id < 2")
    got = mmr_rerank(df, queries, k=6, pool=29, lam_pct=70)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, []).append((r.mmr_round, r.doc_id,
                                                r.score_u))
    for qid in (0, 1):
        cand = [i for i in range(len(X)) if i != qid]  # pool=29 = all
        want = _mirror(X, qid, cand, k=6, lam_pct=70)
        assert sorted(by_q[qid]) == want, qid


def test_lam_100_is_relevance_order(spark, emb_df):
    df, _ = emb_df
    queries = df.where("vec_id = 0")
    mmr = mmr_rerank(df, queries, k=5, pool=20, lam_pct=100)
    rows = sorted(mmr.collect(), key=lambda r: r.mmr_round)
    # λ=100: mmr score = 100·rel, so order must be (rel desc, id asc)
    keys = [(-r.rel_q, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    assert all(r.score_u == 100 * r.rel_q for r in rows)


def test_diversity_reduces_max_pairwise_sim(spark, emb_df):
    df, X = emb_df
    queries = df.where("vec_id = 1")  # near-dups 10, 11 planted around 1

    def max_pair_sim(ids):
        q = np.floor(X.astype(np.float64) * 1e6 + 0.5)
        best = -2.0
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                c = float((q[a] * q[b]).sum()) / (
                    np.sqrt((q[a] ** 2).sum()) * np.sqrt((q[b] ** 2).sum()))
                best = max(best, c)
        return best

    pick = lambda lam: [r.doc_id for r in  # noqa: E731
                        mmr_rerank(df, queries, k=5, pool=29,
                                   lam_pct=lam).collect()]
    assert max_pair_sim(pick(50)) <= max_pair_sim(pick(100))


def test_partition_invariance(spark, emb_df):
    df, _ = emb_df
    queries = df.where("vec_id < 3")
    a = mmr_rerank(df, queries, k=4, pool=20, lam_pct=70)
    b = mmr_rerank(df.repartition(11), queries.coalesce(1), k=4,
                   pool=20, lam_pct=70)
    rows = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    assert rows(a) == rows(b)


def test_guards(spark, emb_df):
    df, _ = emb_df
    with pytest.raises(ValueError, match="lam_pct"):
        mmr_rerank(df, df, lam_pct=101)
    with pytest.raises(ValueError, match="pool"):
        mmr_rerank(df, df, k=10, pool=5)

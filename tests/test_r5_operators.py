"""passage_windows / attribution / fs_weights / distributed k-means."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.behavior import attribution
from msi_preprocessing_pipeline_spark.operators.er import fs_weights
from msi_preprocessing_pipeline_spark.operators.similarity import (
    kmeans_assign, kmeans_fit)
from msi_preprocessing_pipeline_spark.operators.text import passage_windows

SF001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# passage_windows


def test_passage_windows_reassemble(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet") \
        .where(F.col("text").isNotNull())
    out = passage_windows(docs, window_chars=50, overlap=10).toPandas()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("passage_idx")
        text = texts[doc_id]
        # every passage is the exact substring at its offset
        for r in g.itertuples():
            assert r.char_start == r.passage_idx * 40
            assert r.passage == text[r.char_start:r.char_start + 50]
        # windows cover the doc: last window reaches the end
        last = g.iloc[-1]
        assert last.char_start + 50 >= len(text)
        # count matches the closed form
        expk = (max(len(text) - 50, 0) + 39) // 40
        assert len(g) == expk + 1


def test_passage_windows_edge_cases(spark):
    df = spark.createDataFrame(
        [("a", ""), ("b", "x" * 50), ("c", "y" * 51), ("d", None)],
        "doc_id string, text string")
    out = passage_windows(df, window_chars=50, overlap=10).toPandas()
    by = {k: g for k, g in out.groupby("doc_id")}
    assert len(by["a"]) == 1 and by["a"].passage.iloc[0] == ""
    assert len(by["b"]) == 1                    # exactly one full window
    assert len(by["c"]) == 2                    # one char spills over
    assert "d" not in by                        # null text -> no rows
    with pytest.raises(ValueError):
        passage_windows(df, window_chars=50, overlap=50)


# ---------------------------------------------------------------------------
# attribution


def test_attribution_bruteforce(spark):
    touches = [(i, 1, 100 * i) for i in range(1, 8)]          # user 1
    touches += [(100 + i, 2, 1000 + i) for i in range(3)]     # user 2 ties
    convs = [(50, 1, 350), (51, 1, 100), (52, 1, 5000),
             (53, 2, 1002), (54, 3, 7)]
    tdf = spark.createDataFrame(touches,
                                "event_id long, user_id long, ms long")
    cdf = spark.createDataFrame(convs,
                                "event_id long, user_id long, ms long")
    out = attribution(cdf, tdf, conv_ts="ms", touch_ts="ms",
                      horizon_ms=300).toPandas().set_index("conv_id")
    by_user = {}
    for tid, u, ms in touches:
        by_user.setdefault(u, []).append((ms, tid))
    for cid, u, cms in convs:
        win = sorted((ms, tid) for ms, tid in by_user.get(u, [])
                     if cms - 300 <= ms < cms)
        r = out.loc[cid]
        assert r.n_touches == len(win)
        if win:
            assert (r.first_touch_ms, r.first_touch_id) == win[0]
            assert (r.last_touch_ms, r.last_touch_id) == win[-1]
        else:
            assert np.isnan(r.first_touch_ms) and np.isnan(r.last_touch_ms)
    # same-ms touch excluded (strictly before): conv 51 at ms=100
    assert out.loc[51].n_touches == 0


# ---------------------------------------------------------------------------
# fs_weights


def test_fs_weights_hand_computed(spark):
    rows = [
        (True, True, None),     # null agreement counts as disagreement
        (True, False, True),
        (False, True, False),
        (False, True, True),
        (False, False, False),
    ]
    df = spark.createDataFrame(
        rows, "is_match boolean, a1 boolean, a2 boolean")
    out = {r.field: r for r in
           fs_weights(df, ["a1", "a2"], label_col="is_match").collect()}
    # matches: rows 0,1 -> n_match=2; a1 agrees in rows 0,2(x),... rows
    # where is_match: (a1=True, a2=None->False), (a1=False, a2=True)
    r = out["a1"]
    assert (r.n_match, r.n_unmatch) == (2, 3)
    assert (r.agree_match, r.agree_unmatch) == (1, 2)
    m = (1 + 0.5) / (2 + 1.0)
    u = (2 + 0.5) / (3 + 1.0)
    assert math.isclose(r.m, m) and math.isclose(r.u, u)
    assert math.isclose(r.w_agree, math.log(m / u))
    assert math.isclose(r.w_disagree, math.log((1 - m) / (1 - u)))
    r2 = out["a2"]
    assert (r2.agree_match, r2.agree_unmatch) == (1, 1)  # None -> disagree


# ---------------------------------------------------------------------------
# distributed k-means


def _numpy_lloyds(mat_q, init, iters):
    cent = init.astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((mat_q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            members = mat_q[assign == c]
            if len(members):
                # exact integer sum then one division — the operator's rule
                cent[c] = members.astype(object).sum(axis=0).astype(
                    np.float64) / float(len(members))
    return cent


def test_kmeans_matches_numpy_reference(spark):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    cent = kmeans_fit(emb, k=4, iters=3, seed=19, scale=6)
    rows = emb.select(
        "vec_id", "embedding",
        F.xxhash64(F.col("vec_id"), F.lit(19)).alias("h")).collect()
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64)
                    for r in rows])
    q = np.floor(mat * 1e6 + 0.5)
    init = q[np.argsort([r.h for r in rows])[:4]]
    ref = _numpy_lloyds(q, init, iters=3)
    assert np.array_equal(cent, ref)
    # assignment agrees with the reference argmin (ties -> lowest id)
    got = (kmeans_assign(emb, cent, scale=6).toPandas()
           .set_index("vec_id").sort_index())
    d2 = ((q[:, None, :] - ref[None, :, :]) ** 2).sum(axis=2)
    exp = d2.argmin(axis=1)
    ids = [r.vec_id for r in rows]
    order = np.argsort(ids)
    assert (got["cluster"].to_numpy() == exp[order]).all()


def test_kmeans_partitioning_invariant(spark):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    a = kmeans_fit(emb.repartition(2), k=4, iters=2)
    b = kmeans_fit(emb.repartition(9), k=4, iters=2)
    assert np.array_equal(a, b)


def test_kmeans_empty_corpus_raises(spark):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet") \
        .where(F.lit(False))
    with pytest.raises(ValueError):
        kmeans_fit(emb, k=4)


def test_kmeans_null_embeddings(spark):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    with_null = emb.withColumn(
        "embedding", F.when(F.col("vec_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("embedding")))
    cent = kmeans_fit(with_null, k=4, iters=2)
    # fit over nulls == fit over the null-free subset
    ref = kmeans_fit(emb.where(~(F.col("vec_id") % 7 == 0)), k=4, iters=2)
    assert np.array_equal(cent, ref)
    out = kmeans_assign(with_null, cent).toPandas().set_index("vec_id")
    nulls = out[out.index % 7 == 0]
    assert len(nulls) > 0
    assert nulls["cluster"].isna().all() and nulls["dist"].isna().all()
    assert out[out.index % 7 != 0]["cluster"].notna().all()

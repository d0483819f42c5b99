"""Product quantization: numpy parity for fit/encode/ADC, partition
invariance (the golden-pin precondition), and recall sanity vs exact L2."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pq_fit_partition_invariant(spark):
    from msi_preprocessing_pipeline_spark.operators.similarity import (
        pq_fit)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = pq_fit(emb, m=8, k=8, iters=3, seed=19)
    b = pq_fit(emb.repartition(7), m=8, k=8, iters=3, seed=19)
    assert np.array_equal(a, b)  # bit-equal, not allclose


def test_pq_encode_matches_numpy(spark):
    from msi_preprocessing_pipeline_spark.operators.similarity import (
        pq_encode, pq_fit)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = pq_fit(emb, m=8, k=8, iters=2, seed=19)
    got = pq_encode(emb, books).toPandas().set_index("vec_id")["codes"]
    pdf = emb.toPandas()
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    Q = np.floor(M * 1e6 + 0.5)
    sub = Q.shape[1] // 8
    for i, vid in enumerate(pdf["vec_id"]):
        exp = [int(((Q[i, s * sub:(s + 1) * sub][None, :]
                     - books[s]) ** 2).sum(axis=1).argmin())
               for s in range(8)]
        assert list(got.loc[vid]) == exp, vid


def test_pq_encode_null_embedding(spark):
    from msi_preprocessing_pipeline_spark.operators.similarity import (
        pq_encode)

    df = spark.createDataFrame(
        [(1, [0.5] * 16), (2, None)],
        "vec_id long, embedding array<double>")
    # codebooks live in QUANTIZED units: 0.5 → 500000, so codeword 1
    # (=1.0 quantized-unit) is nearer than codeword 0 (=0)... both are
    # tiny next to 500000 — codeword 1 wins each subspace
    books = np.zeros((4, 2, 4))
    books[:, 1, :] = 1.0
    out = pq_encode(df, books).toPandas().set_index("vec_id")["codes"]
    assert list(out.loc[1]) == [1, 1, 1, 1]
    nullcell = out.loc[2]
    assert nullcell is None or (isinstance(nullcell, float)
                                and np.isnan(nullcell))


def test_pq_adc_matches_numpy_and_recall(spark):
    from msi_preprocessing_pipeline_spark.operators.similarity import (
        pq_adc_topk, pq_encode, pq_fit)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = pq_fit(emb, m=8, k=16, iters=3, seed=19)
    codes = pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 4)
    got = pq_adc_topk(codes, books, queries, topk=10).toPandas()

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    Q = np.floor(M * 1e6 + 0.5).astype(np.int64)
    sub = Q.shape[1] // 8
    bki = np.rint(books).astype(np.int64)
    code_mat = np.stack([
        [(((Q[i, s * sub:(s + 1) * sub].astype(np.float64)[None, :]
            - books[s]) ** 2).sum(axis=1)).argmin() for s in range(8)]
        for i in range(len(Q))])
    ids = pdf["vec_id"].to_numpy()
    for qid in range(4):
        qv = Q[ids == qid][0]
        tab = np.stack([
            ((qv[s * sub:(s + 1) * sub][None, :] - bki[s]) ** 2)
            .sum(axis=1) for s in range(8)])
        adc = tab[np.arange(8)[:, None], code_mat.T].sum(axis=0)
        # self-matches excluded (the ANN-family contract)
        keep = ids != qid
        order = np.lexsort((ids[keep], adc[keep]))[:10]
        kids, kadc = ids[keep], adc[keep]
        sl = got[got.query_id == qid].sort_values("rank")
        assert list(sl["neighbor_id"]) == [int(kids[o]) for o in order]
        assert list(sl["adc_q"]) == [int(kadc[o]) for o in order]
        assert qid not in set(sl["neighbor_id"])
        # recall sanity vs exact L2 (self excluded there too): PQ is
        # lossy by design and 50 near-orthogonal random vectors are its
        # worst case — the exact-value asserts above are the contract;
        # this only guards against a totally-degenerate table
        true_d = ((Q - qv[None, :]).astype(np.float64) ** 2).sum(axis=1)
        true_top = set(ids[keep][np.lexsort((ids[keep],
                                             true_d[keep]))[:10]])
        assert len(true_top & set(sl["neighbor_id"])) >= 1


def test_pq_adc_partition_invariant(spark):
    from msi_preprocessing_pipeline_spark.operators.similarity import (
        pq_adc_topk, pq_encode, pq_fit)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = pq_fit(emb, m=4, k=8, iters=2, seed=19)
    q = emb.where(F.col("vec_id") < 2)
    a = pq_adc_topk(pq_encode(emb, books), books, q, topk=5) \
        .toPandas().sort_values(["query_id", "rank"]) \
        .reset_index(drop=True)
    b = pq_adc_topk(pq_encode(emb.repartition(5), books), books, q,
                    topk=5).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_pq_adc_code_mismatch_raises(spark):
    """Serving with codebooks whose k disagrees with the codes must
    raise, not silently read the next subspace's table cells."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from msi_preprocessing_pipeline_spark.operators.similarity import (
        pq_adc_topk, pq_encode, pq_fit)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books16 = pq_fit(emb, m=4, k=16, iters=1, seed=19)
    codes16 = pq_encode(emb, books16)
    books8 = books16[:, :8, :]  # a re-fit with smaller k
    q = emb.where(F.col("vec_id") < 1)
    with pytest.raises(Exception) as ei:
        pq_adc_topk(codes16, books8, q, topk=5).collect()
    assert "pq_adc_topk" in str(ei.value)


def test_pq_adc_overflow_guard(spark):
    """Driver-side ADC table construction fails fast before int64 wrap
    (magnitudes ~3e3 at scale 6 quantize to ~3e9; a squared diff against
    an opposite-sign codeword exceeds 2^62)."""
    import pytest
    from msi_preprocessing_pipeline_spark.operators.similarity import (
        pq_adc_topk)

    q = spark.createDataFrame([(1, [3000.0] * 8)],
                              "vec_id long, embedding array<double>")
    codes = spark.createDataFrame([(2, [0, 0])],
                                  "vec_id long, codes array<int>")
    books = np.full((2, 2, 4), -3.0e9)
    with pytest.raises(OverflowError, match="overflow"):
        pq_adc_topk(codes, books, q, topk=1)

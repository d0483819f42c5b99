"""length_bucket_batches: exact pow2 buckets (incl. the log2-hazard
powers), md5-deterministic batch formation vs a python mirror, cap /
truncation, waste bound, partition invariance, guards."""
import hashlib
import math

import pytest
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.packing import (
    length_bucket_batches)


def _df(spark, sizes):
    return spark.createDataFrame(
        [Row(doc_id=i, n_tok=s) for i, s in enumerate(sizes)],
        "doc_id long, n_tok int")


def _mirror(sizes, batch_tokens, min_b, max_b, seed=0):
    out = {}
    by_bucket = {}
    for i, s in enumerate(sizes):
        s0 = s or 0
        raw = 1 << (max(s0, 2) - 1).bit_length()
        b = min(max(raw, min_b), max_b)
        by_bucket.setdefault(b, []).append(i)
        out[i] = {"bucket": b, "pad": b - min(s0, b),
                  "truncated": s0 > b}
    for b, ids in by_bucket.items():
        ids.sort(key=lambda i: (
            hashlib.md5(f"{i}:{seed}".encode()).hexdigest(), i))
        dpb = batch_tokens // b
        for rk, i in enumerate(ids):
            out[i]["batch_in_bucket"] = rk // dpb
            out[i]["pos_in_batch"] = rk % dpb
    return out


def test_exact_pow2_buckets_at_boundaries(spark):
    # exact powers of two are the log2-rounding hazard: 64 must land in
    # bucket 64, not 128; 65 in 128
    sizes = [1, 2, 3, 16, 17, 64, 65, 127, 128, 129, 4096, 5000, None]
    got = {r["doc_id"]: r for r in
           length_bucket_batches(_df(spark, sizes), 8192).collect()}
    exp = _mirror(sizes, 8192, 16, 4096)
    for i in range(len(sizes)):
        assert got[i]["bucket"] == exp[i]["bucket"], (i, sizes[i])
        assert got[i]["pad"] == exp[i]["pad"]
        assert got[i]["truncated"] == exp[i]["truncated"]
    assert got[5]["bucket"] == 64 and got[6]["bucket"] == 128
    assert got[11]["truncated"] and got[11]["bucket"] == 4096
    assert got[12]["bucket"] == 16  # null -> 0 tokens -> floor bucket


def test_batch_formation_matches_mirror(spark):
    sizes = [(i * 29) % 200 + 1 for i in range(57)]
    got = {r["doc_id"]: r for r in
           length_bucket_batches(_df(spark, sizes), 1024,
                                 min_bucket=16, max_bucket=256,
                                 seed=3).collect()}
    exp = _mirror(sizes, 1024, 16, 256, seed=3)
    for i in range(57):
        for k in ("bucket", "batch_in_bucket", "pos_in_batch", "pad"):
            assert got[i][k] == exp[i][k], (i, k, got[i], exp[i])


def test_batches_full_and_waste_bounded(spark):
    sizes = [100] * 40  # bucket 128, dpb = 1024//128 = 8
    got = length_bucket_batches(_df(spark, sizes), 1024,
                                max_bucket=1024).collect()
    per_batch = {}
    for r in got:
        assert r["bucket"] == 128 and r["pad"] == 28
        per_batch.setdefault(r["batch_in_bucket"], []).append(
            r["pos_in_batch"])
    assert len(per_batch) == 5  # 40 docs / 8 per batch
    for poss in per_batch.values():
        assert sorted(poss) == list(range(8))


def test_partition_invariance(spark):
    sizes = [(i * 13) % 300 + 1 for i in range(80)]
    a = sorted(map(tuple, length_bucket_batches(
        _df(spark, sizes), 2048, max_bucket=512).collect()))
    b = sorted(map(tuple, length_bucket_batches(
        _df(spark, sizes).repartition(11), 2048,
        max_bucket=512).collect()))
    assert a == b


def test_guards(spark):
    df = _df(spark, [10])
    with pytest.raises(ValueError, match="batch_tokens"):
        length_bucket_batches(df, 100, max_bucket=4096)
    with pytest.raises(ValueError, match="power of two"):
        length_bucket_batches(df, 8192, min_bucket=24)

"""Bloom runtime-filter join pruning: row identity vs the plain
semi/anti join, the no-false-negative guarantee, sizing, partitioning
invariance, bitmap reuse, and the map-only probe plan."""
import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from msi_preprocessing_pipeline_spark.operators.runtime_filter import (
    BloomFilter, bloom_build, bloom_params, bloom_semi_join)


def _probe(spark, n=500):
    return spark.createDataFrame(
        [Row(pid=i, key=i % 97, payload=f"p{i}") for i in range(n)],
        "pid long, key long, payload string")


def _build(spark, keys):
    return spark.createDataFrame([Row(bk=int(k)) for k in keys],
                                 "bk long")


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_row_identical_to_plain_join(spark, how):
    probe = _probe(spark)
    build = _build(spark, [3, 10, 11, 42, 96, 200])  # 200 never matches
    got = bloom_semi_join(probe, build, "key", "bk", how=how)
    exp = probe.join(build.select("bk").distinct(),
                     probe.key == F.col("bk"), f"left_{how}")
    assert _rows(got) == _rows(exp)
    assert got.columns == probe.columns


def test_no_false_negatives_even_at_high_fpp(spark):
    # fpp=0.5 makes false positives likely; members must ALL still pass
    probe = _probe(spark, 300)
    members = list(range(0, 97, 3))
    build = _build(spark, members)
    bf = bloom_build(build.select(F.col("bk").alias("k")), "k", fpp=0.5)
    flagged = bf.might_contain(probe, "key", "maybe")
    missed = flagged.where((F.col("key").isin(members)) &
                           ~F.col("maybe")).count()
    assert missed == 0
    # and the full join result stays exact despite the sloppy bitmap
    got = bloom_semi_join(probe, build, "key", "bk", how="semi", fpp=0.5)
    exp = probe.join(build.select("bk").distinct(),
                     probe.key == F.col("bk"), "left_semi")
    assert _rows(got) == _rows(exp)


def test_fp_rate_within_sizing_bound(spark):
    # 1000 members, 10k non-member probes at fpp=0.01: observed rate
    # should be within a loose factor of the target
    members = spark.range(1000).select(F.col("id").alias("k"))
    bf = bloom_build(members, "k", fpp=0.01)
    outsiders = spark.range(100_000, 110_000).select(
        F.col("id").alias("key"))
    fp = bf.might_contain(outsiders, "key", "maybe") \
        .where("maybe").count()
    assert fp / 10_000 < 0.05


def test_sizing_formulas():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0 and 9000 <= m <= 10100  # ≈ 9.585 bits/key
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        bloom_params(10, 0.0)


def test_max_bits_fail_fast(spark):
    keys = spark.range(100).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="max_bits"):
        bloom_build(keys, "k", fpp=0.001, max_bits=512)


def test_partitioning_invariance(spark):
    # identical bitmap words whatever the input partitioning
    keys = [7, 13, 29, 500, 501]
    a = bloom_build(_build(spark, keys).repartition(1), "bk", fpp=0.01)
    b = bloom_build(_build(spark, keys).repartition(7), "bk", fpp=0.01)
    assert a.n_bits == b.n_bits and a.k == b.k
    assert np.array_equal(a.words, b.words)


def test_null_keys(spark):
    probe = spark.createDataFrame(
        [Row(pid=1, key=5), Row(pid=2, key=None), Row(pid=3, key=6)],
        "pid long, key long")
    build = spark.createDataFrame(
        [Row(bk=5), Row(bk=None)], "bk long")
    semi = bloom_semi_join(probe, build, "key", "bk", how="semi")
    anti = bloom_semi_join(probe, build, "key", "bk", how="anti")
    # null never equi-matches: semi drops it, anti keeps it
    assert [r.pid for r in semi.collect()] == [1]
    assert sorted(r.pid for r in anti.collect()) == [2, 3]


def test_prebuilt_bloom_reuse(spark):
    probe = _probe(spark)
    build = _build(spark, [1, 2, 3])
    keys = build.select(F.col("bk").alias("__bloom_key")).distinct()
    bf = bloom_build(keys, "__bloom_key", fpp=0.01)
    got = bloom_semi_join(probe, build, "key", "bk", how="semi",
                          bloom=bf)
    exp = probe.join(build.select("bk").distinct(),
                     probe.key == F.col("bk"), "left_semi")
    assert _rows(got) == _rows(exp)


def test_probe_filter_runs_before_join_exchange(spark):
    """The point of the operator: the bloom prune is a map-only
    ArrowEvalPython/FlatMapsInArrow stage with NO Exchange between the
    probe scan and the filter — shuffle reduction happens upstream of
    the exact join."""
    probe = _probe(spark, 1000)
    build = _build(spark, [1, 2, 3, 4])
    keys = build.select(F.col("bk").alias("k")).distinct()
    bf = bloom_build(keys, "k", fpp=0.01)
    pruned = bf.might_contain(probe, "key", "maybe").where("maybe")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert "Exchange" not in plan  # scan → hash → bit test → filter


def test_mismatched_key_types_fail_fast(spark):
    probe = spark.createDataFrame([Row(pid=1, key=5)],
                                  "pid long, key int")
    build = spark.createDataFrame([Row(bk=5)], "bk long")
    with pytest.raises(ValueError, match="key types differ"):
        bloom_semi_join(probe, build, "key", "bk", how="semi")


def test_broadcast_cached_across_probes(spark):
    keys = spark.range(50).select(F.col("id").alias("k"))
    bf = bloom_build(keys, "k", fpp=0.01)
    probe = spark.range(100).select(F.col("id").alias("key"))
    bf.might_contain(probe, "key", "m1").count()
    bf.might_contain(probe, "key", "m2").count()
    assert len(bf._bc_cache) == 1  # one broadcast per SparkContext

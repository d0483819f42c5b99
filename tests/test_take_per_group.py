"""take_per_group: exact per-group quotas from an allocation relation,
md5-draw parity with group_sample_k, missing/zero/null quotas, and
partition invariance of the composed temperature-mixture draw."""
import hashlib

from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.sampling import (
    group_sample_k, take_per_group, temperature_mixture_plan)


def _docs(spark, n=40, srcs=4):
    return spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i % srcs}", n_tok=(i * 13) % 50 + 1)
         for i in range(n)],
        "doc_id long, source string, n_tok int")


def _alloc(spark, rows):
    return spark.createDataFrame(
        [Row(group=g, alloc_docs=n) for g, n in rows],
        "group string, alloc_docs long")


def test_exact_quota_per_group(spark):
    df = _docs(spark)
    alloc = _alloc(spark, [("s0", 3), ("s1", 7), ("s2", 0), ("s3", 2)])
    got = take_per_group(df, alloc, key="doc_id").collect()
    by = {}
    for r in got:
        by[r["source"]] = by.get(r["source"], 0) + 1
    assert by == {"s0": 3, "s1": 7, "s3": 2}


def test_quota_larger_than_group_keeps_whole_group(spark):
    df = _docs(spark, n=8, srcs=2)  # 4 docs per source
    alloc = _alloc(spark, [("s0", 99), ("s1", 1)])
    got = take_per_group(df, alloc, key="doc_id").collect()
    by = {}
    for r in got:
        by[r["source"]] = by.get(r["source"], 0) + 1
    assert by == {"s0": 4, "s1": 1}


def test_groups_missing_from_alloc_drop(spark):
    df = _docs(spark, n=12, srcs=3)
    alloc = _alloc(spark, [("s1", 2)])
    got = take_per_group(df, alloc, key="doc_id").collect()
    assert {r["source"] for r in got} == {"s1"} and len(got) == 2


def test_draw_matches_group_sample_k_and_md5_order(spark):
    df = _docs(spark, n=20, srcs=2)
    alloc = _alloc(spark, [("s0", 3), ("s1", 3)])
    a = sorted(r["doc_id"] for r in
               take_per_group(df, alloc, key="doc_id", seed=5).collect())
    b = sorted(r["doc_id"] for r in
               group_sample_k(df, "doc_id", "source", 3, seed=5).collect())
    assert a == b
    # the draw IS the md5 rank: lowest-hash doc ids per group win
    rows = df.collect()
    exp = []
    for s in ("s0", "s1"):
        ids = [r["doc_id"] for r in rows if r["source"] == s]
        ids.sort(key=lambda i: (hashlib.md5(f"{i}:5".encode()).hexdigest(),
                                i))
        exp += ids[:3]
    assert a == sorted(exp)


def test_composes_with_temperature_mixture_partition_invariant(spark):
    df = _docs(spark, n=60, srcs=5)
    alloc = temperature_mixture_plan(df, 23, group_col="source",
                                     tokens_col="n_tok")
    take = take_per_group(df, alloc, key="doc_id")
    got = sorted(r["doc_id"] for r in take.collect())
    assert len(got) == 23
    alloc2 = temperature_mixture_plan(df.repartition(7), 23,
                                      group_col="source",
                                      tokens_col="n_tok")
    got2 = sorted(r["doc_id"] for r in
                  take_per_group(df.repartition(3), alloc2,
                                 key="doc_id").collect())
    assert got == got2

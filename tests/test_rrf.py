"""rrf_fuse: formula vs python mirror, multi-system boost, tie-break,
null ranks, top_n, partition invariance."""
import math

from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.retrieval import rrf_fuse


def _runs(spark, rows):
    return spark.createDataFrame(
        [Row(query_id=q, doc_id=d, rank=r) for q, d, r in rows],
        "query_id string, doc_id long, rank long")


def _mirror(rows, k=60):
    s = {}
    for q, d, r in rows:
        if r is None:
            continue
        s[(q, d)] = s.get((q, d), 0) + math.floor(
            1.0 / (float(k) + float(r)) * 1e12 + 0.5)
    return s


def test_matches_mirror_and_consensus_wins(spark):
    rows = [("q", 1, 1), ("q", 2, 2), ("q", 3, 3),   # system A
            ("q", 2, 1), ("q", 4, 2), ("q", 1, 5)]   # system B
    got = {(r["query_id"], r["doc_id"]): r
           for r in rrf_fuse(_runs(spark, rows)).collect()}
    exp = _mirror(rows)
    for key, r in got.items():
        assert r["rrf_score_u"] == exp[key], key
    # doc 2 (ranks 2+1) beats doc 1 (ranks 1+5)
    assert got[("q", 2)]["fused_rank"] == 1
    assert got[("q", 1)]["fused_rank"] == 2
    assert got[("q", 2)]["n_systems"] == 2


def test_tie_breaks_by_doc_id(spark):
    rows = [("q", 9, 1), ("q", 5, 1)]  # same single-system rank
    got = {r["doc_id"]: r["fused_rank"]
           for r in rrf_fuse(_runs(spark, rows)).collect()}
    assert got == {5: 1, 9: 2}


def test_null_ranks_dropped_and_top_n(spark):
    rows = [("q", 1, 1), ("q", 2, None), ("q", 3, 2), ("q", 4, 3)]
    got = rrf_fuse(_runs(spark, rows), top_n=2).collect()
    assert {r["doc_id"] for r in got} == {1, 3}


def test_partition_invariance(spark):
    rows = [("q%d" % (i % 3), i % 17, (i * 7) % 10 + 1)
            for i in range(200)]
    a = sorted(map(tuple, rrf_fuse(_runs(spark, rows)).collect()))
    b = sorted(map(tuple,
                   rrf_fuse(_runs(spark, rows).repartition(11)).collect()))
    assert a == b

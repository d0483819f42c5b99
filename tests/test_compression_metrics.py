"""compression_metrics: repetitive vs diverse text ordering, python
zlib mirror equality, null/empty handling, map-only plan."""
import zlib

from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.text import (
    compression_metrics)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        "doc_id long, text string")


def test_matches_zlib_mirror(spark):
    rows = ["hello world " * 40,
            "the quick brown fox jumps over the lazy dog",
            "abcdefghijklmnopqrstuvwxyz0123456789" * 3]
    got = {r["doc_id"]: r for r in
           compression_metrics(_df(spark, rows)).collect()}
    for i, t in enumerate(rows):
        raw = t.encode("utf-8")
        comp = zlib.compress(raw, 6)
        assert got[i]["n_bytes"] == len(raw)
        assert got[i]["n_compressed"] == len(comp)
        assert got[i]["compression_ratio_u"] == int(
            len(comp) / len(raw) * 1e6 + 0.5)


def test_repetitive_compresses_more_than_diverse(spark):
    rows = ["spam spam spam " * 50,
            " ".join(f"unique{i}token{i * 7}" for i in range(100))]
    got = {r["doc_id"]: r["compression_ratio_u"] for r in
           compression_metrics(_df(spark, rows)).collect()}
    assert got[0] < got[1] / 3


def test_null_and_empty(spark):
    got = {r["doc_id"]: r for r in
           compression_metrics(_df(spark, [None, ""])).collect()}
    assert got[0]["compression_ratio_u"] is None
    assert got[1]["n_bytes"] is None


def test_plan_is_single_map_pass(spark):
    plan = compression_metrics(_df(spark, ["abc"])) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1

"""dedup_lines_in_doc: keep-first within doc, short-line exemption,
cross-doc independence, null/empty text, map-only plan pin."""
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.text import (
    dedup_lines_in_doc)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        "doc_id long, text string")


def test_keep_first_within_doc(spark):
    text = "hello world\nfiller line\nhello world\nthird line\nhello world"
    got = dedup_lines_in_doc(_df(spark, [text])).collect()[0]
    assert got["text"] == "hello world\nfiller line\nthird line"
    assert got["n_lines_removed"] == 2


def test_short_lines_always_kept(spark):
    text = "ad\nlong enough line\nad\nlong enough line\nad"
    got = dedup_lines_in_doc(_df(spark, [text]), min_chars=5).collect()[0]
    assert got["text"] == "ad\nlong enough line\nad\nad"
    assert got["n_lines_removed"] == 1


def test_cross_doc_independence(spark):
    # the same line in two docs survives in BOTH (in-doc scope only)
    rows = ["shared line here\nunique a", "shared line here\nunique b"]
    got = {r["doc_id"]: r["text"]
           for r in dedup_lines_in_doc(_df(spark, rows)).collect()}
    assert got[0].startswith("shared line here")
    assert got[1].startswith("shared line here")


def test_null_and_empty_text(spark):
    got = {r["doc_id"]: r for r in
           dedup_lines_in_doc(_df(spark, [None, ""])).collect()}
    assert got[0]["text"] is None and got[0]["n_lines_removed"] == 0
    assert got[1]["text"] == "" and got[1]["n_lines_removed"] == 0


def test_plan_is_map_only(spark):
    df = _df(spark, ["a line that is long\nanother"])
    plan = dedup_lines_in_doc(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "mapInPandas" not in plan and "MapInPandas" not in plan

"""Boilerplate line census + removal (CCNet/Dolma-style line dedup)."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.text import (
    boilerplate_lines, remove_boilerplate)


@pytest.fixture(scope="module")
def corpus(spark):
    hdr = "COPYRIGHT ACME CORP"
    return spark.createDataFrame([
        Row(doc_id=1, source="a", text=f"{hdr}\nalpha body one\nunique x"),
        Row(doc_id=2, source="a", text=f"{hdr}\nbeta body two"),
        Row(doc_id=3, source="a", text=f"{hdr}\n{hdr}\ngamma body"),
        Row(doc_id=4, source="a", text="no header here at all"),
        # same header in source b, but only 1 of 2 docs -> frac 0.5
        Row(doc_id=5, source="b", text=f"{hdr}\ndelta body"),
        Row(doc_id=6, source="b", text="epsilon body\n..."),
        Row(doc_id=7, source="b", text=None),
    ])


def test_census_flags_per_source(corpus):
    got = {(r["source"], r["line"]): (r["n_docs_with_line"], r["frac"])
           for r in boilerplate_lines(corpus, min_docs=2, min_frac=0.6,
                                      min_chars=5).collect()}
    # presence-counted once even though doc 3 repeats the header twice
    assert got == {("a", "COPYRIGHT ACME CORP"): (3, 0.75)}


def test_census_short_lines_never_flagged(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", text="...\nlong shared line here")
         for i in range(4)])
    lines = {r["line"] for r in
             boilerplate_lines(df, min_frac=0.5).collect()}
    assert lines == {"long shared line here"}


def test_remove_rewrites_and_counts(corpus):
    out = {r["doc_id"]: r for r in
           remove_boilerplate(corpus, min_docs=2, min_frac=0.6,
                              min_chars=5).collect()}
    assert out[1]["text"] == "alpha body one\nunique x"
    assert out[1]["n_lines_removed"] == 1
    # both occurrences inside doc 3 are deleted
    assert out[3]["text"] == "gamma body"
    assert out[3]["n_lines_removed"] == 2
    assert out[4]["text"] == "no header here at all"
    assert out[4]["n_lines_removed"] == 0
    # source b is below threshold: header survives there
    assert out[5]["text"].startswith("COPYRIGHT")
    # null text passes through as null, not empty
    assert out[7]["text"] is None and out[7]["n_lines_removed"] == 0
    assert set(out[1].asDict()) == {
        "doc_id", "source", "text", "n_lines_removed"}


def test_remove_fully_boilerplate_doc_becomes_empty(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="s", text="the only line") for i in range(3)])
    out = remove_boilerplate(df, min_frac=0.5).collect()
    assert all(r["text"] == "" and r["n_lines_removed"] == 1 for r in out)


def test_census_validates_args(corpus):
    with pytest.raises(ValueError, match="min_frac"):
        boilerplate_lines(corpus, min_frac=0.0)
    with pytest.raises(ValueError, match="min_docs"):
        boilerplate_lines(corpus, min_docs=0)

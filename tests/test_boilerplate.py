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


# ---------------------------------------------------------------------------
# dedup_paragraphs (corpus-global keep-first)


@pytest.fixture(scope="module")
def para_corpus(spark):
    from pyspark.sql import Row
    dup = "this exact paragraph repeats across documents"
    return spark.createDataFrame([
        Row(doc_id=1, text=f"{dup}\nunique to doc one\n--"),
        Row(doc_id=2, text=f"intro line two\n{dup}\n--"),
        # within-doc repeat: second copy must go
        Row(doc_id=3, text=f"own text of three\nown text of three"),
        # short duplicate line survives everywhere
        Row(doc_id=4, text="--\n--"),
        Row(doc_id=5, text=None),
    ])


def test_dedup_paragraphs_keep_first_global(para_corpus):
    from msi_preprocessing_pipeline_spark.operators.text import (
        dedup_paragraphs)

    out = {r.doc_id: r for r in
           dedup_paragraphs(para_corpus, min_chars=5).collect()}
    dup = "this exact paragraph repeats across documents"
    # doc 1 holds the first occurrence -> untouched
    assert out[1].text == f"{dup}\nunique to doc one\n--"
    assert out[1].n_paragraphs_removed == 0
    # doc 2 loses the global duplicate only
    assert out[2].text == "intro line two\n--"
    assert out[2].n_paragraphs_removed == 1
    # within-doc repeat: keep pos 0, drop pos 1
    assert out[3].text == "own text of three"
    assert out[3].n_paragraphs_removed == 1
    # short lines are never deduped
    assert out[4].text == "--\n--"
    assert out[4].n_paragraphs_removed == 0
    # null text passes through
    assert out[5].text is None and out[5].n_paragraphs_removed == 0


def test_dedup_paragraphs_partitioning_invariant(spark):
    """Keep-first is a deterministic (id, pos) argmin — identical
    output under different partitionings."""
    from pyspark.sql import Row

    from msi_preprocessing_pipeline_spark.operators.text import (
        dedup_paragraphs)

    rows = [Row(doc_id=i,
                text="\n".join(f"shared paragraph number {j % 4}"
                               for j in range(i % 6 + 1)))
            for i in range(30)]
    a = spark.createDataFrame(rows).repartition(1)
    b = spark.createDataFrame(rows).repartition(13)
    ga = sorted((r.doc_id, r.text, r.n_paragraphs_removed)
                for r in dedup_paragraphs(a).collect())
    gb = sorted((r.doc_id, r.text, r.n_paragraphs_removed)
                for r in dedup_paragraphs(b).collect())
    assert ga == gb
    # every eligible distinct line survives exactly once corpus-wide
    kept = [line for _, t, _ in ga for line in t.split("\n") if t]
    long_kept = [l for l in kept if len(l) >= 5]
    assert len(long_kept) == len(set(long_kept)) == 4


# ---------------------------------------------------------------------------
# c4_filter


def test_c4_filter_line_and_doc_rules(spark):
    from pyspark.sql import Row

    from msi_preprocessing_pipeline_spark.operators.text import c4_filter

    good = ("this sentence has enough words to pass.\n"
            "another proper sentence is here for you!\n"
            'a third one ends with a quote so it stays."')
    df = spark.createDataFrame([
        Row(doc_id=1, text=good),
        # line rules: no terminal punct / too few words / javascript
        Row(doc_id=2, text=(good + "\nclick here now\nshort line here.\n"
                            "please enable JavaScript to continue now.")),
        # doc rules: lorem ipsum / curly brace poison the whole doc
        Row(doc_id=3, text=good + "\nsome Lorem Ipsum filler is here."),
        Row(doc_id=4, text=good + "\nvar x = { broken: true };"),
        # too few surviving lines
        Row(doc_id=5, text="only one good line survives this time."),
        Row(doc_id=6, text=None),
    ])
    out = {r.doc_id: r for r in
           c4_filter(df, min_words=5, min_lines=3).collect()}
    assert out[1].text == good and out[1].n_lines_kept == 3
    assert out[1].keep_doc is True
    assert out[2].text == good and out[2].n_lines_kept == 3
    assert out[2].keep_doc is True
    assert out[3].keep_doc is False      # lorem ipsum, case-insensitive
    assert out[3].n_lines_kept == 4      # the lorem line itself is kept
    assert out[4].keep_doc is False      # '{' poisons the doc
    assert out[5].keep_doc is False and out[5].n_lines_kept == 1
    assert out[6].text is None and out[6].n_lines_kept == 0
    assert out[6].keep_doc is False


# ---------------------------------------------------------------------------
# gram_novelty


def test_gram_novelty_keep_first_by_shard(spark):
    from pyspark.sql import Row

    from msi_preprocessing_pipeline_spark.operators.text import (
        gram_novelty)

    df = spark.createDataFrame([
        Row(doc_id=1, source="a", text="x y z w"),      # grams: xyz, yzw
        Row(doc_id=2, source="b", text="x y z"),        # gram xyz (seen in a)
        Row(doc_id=3, source="b", text="p q r"),        # gram pqr (novel)
        Row(doc_id=4, source="a", text="x y z"),        # repeat within a
        Row(doc_id=5, source=None, text="x y z"),       # null shard loses
        Row(doc_id=6, source=None, text="n o v"),       # exclusive -> novel
        Row(doc_id=7, source="c", text=None),           # null text: no grams
    ])
    got = {r.source: (r.n_occurrences, r.n_distinct, r.n_novel)
           for r in gram_novelty(df, n=3).collect()}
    assert got["a"] == (3, 2, 2)      # xyz, yzw both first in 'a'
    assert got["b"] == (2, 2, 1)      # xyz seen, pqr novel
    assert got[None] == (2, 2, 1)     # nov exclusive to null shard
    assert "c" not in got             # null text emits nothing


# ---------------------------------------------------------------------------
# cohens_kappa


def test_cohens_kappa_textbook_example(spark):
    """The classic 2x2 example: po=0.70, pe=0.50 -> kappa=0.40, plus
    null handling and exact integer outputs."""
    from pyspark.sql import Row

    from msi_preprocessing_pipeline_spark.operators.experiment import (
        cohens_kappa)

    rows = ([Row(a="y", b="y")] * 25 + [Row(a="y", b="n")] * 15
            + [Row(a="n", b="y")] * 15 + [Row(a="n", b="n")] * 45
            + [Row(a=None, b="y")] * 3 + [Row(a="y", b=None)] * 2)
    [r] = cohens_kappa(spark.createDataFrame(rows), "a", "b").collect()
    assert (r.n, r.n_null, r.n_agree) == (100, 5, 70)
    # sum_rc = r_y*c_y + r_n*c_n = 40*40 + 60*60 = 5200
    assert r.sum_rc == 5200
    assert r.kappa == pytest.approx((100 * 70 - 5200) / (100 * 100 - 5200),
                                    rel=1e-15)


def test_cohens_kappa_degenerate_constant_columns(spark):
    from pyspark.sql import Row

    from msi_preprocessing_pipeline_spark.operators.experiment import (
        cohens_kappa)

    [r] = cohens_kappa(spark.createDataFrame(
        [Row(a="x", b="x")] * 4), "a", "b").collect()
    assert r.n == 4 and r.n_agree == 4 and r.sum_rc == 16
    assert r.kappa is None  # n^2 == sum_rc -> chance-saturated
    # disjoint label sets: sum_rc = 0, kappa = n_agree/n = 0
    [r2] = cohens_kappa(spark.createDataFrame(
        [Row(a="x", b="y")] * 4), "a", "b").collect()
    assert r2.sum_rc == 0 and r2.kappa == 0.0


# ---------------------------------------------------------------------------
# streaming composition: the C4 filter is stateless map-only, so it must
# run unchanged on a streaming DataFrame with batch-identical output


def test_c4_filter_streaming_matches_batch(spark, tmp_path):
    import os
    import shutil

    from msi_preprocessing_pipeline_spark.operators.text import c4_filter

    doc_dir = str(tmp_path / "docs")
    os.makedirs(doc_dir)
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                f"{doc_dir}/part-0.parquet")
    raw = spark.read.parquet(doc_dir)
    batch = {(r.doc_id, r.n_lines_kept, r.keep_doc)
             for r in c4_filter(raw).collect()}

    stream = spark.readStream.schema(raw.schema).parquet(doc_dir)
    q = (c4_filter(stream).writeStream.outputMode("append")
         .format("memory").queryName("c4_stream")
         .trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    got = {(r.doc_id, r.n_lines_kept, r.keep_doc)
           for r in spark.sql("select * from c4_stream").collect()}
    assert got == batch and len(got) > 0

"""End-to-end corpus curation plan: quality gates → decontamination →
exact dedup → near-dup clustering, composed from the engine's operators."""

import pandas as pd
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.plans.corpus import (
    CurationConfig, curate_corpus, quality_pass)

SF_DIR = "/root/testdata/sf0.001"


def test_curate_corpus_end_to_end(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    cfg = CurationConfig()

    # pick a document that passes the quality gates and plant duplicates:
    # two exact copies and one near-dup (one word appended)
    base = (quality_pass(docs, cfg)
            .where(F.col("doc_id") % 17 != 0)  # keep out of the benchmark
            .orderBy("doc_id").select("doc_id", "text").first())
    max_id = docs.agg(F.max("doc_id")).first()[0]
    planted = spark.createDataFrame(pd.DataFrame({
        "doc_id": [max_id + 1, max_id + 2, max_id + 3],
        "text": [base["text"], base["text"] + "  ",  # exact after normalize
                 base["text"] + " extra"],            # near-dup
    }))
    corpus = docs.unionByName(planted)

    benchmark = docs.where(F.col("doc_id") % 17 == 0) \
        .select("doc_id", "text")
    kept = curate_corpus(corpus, benchmark, cfg, with_report=True) \
        .toPandas()

    # report is monotone non-increasing through the stages
    r = cfg.report
    order = ["input", "quality", "decontaminated", "exact_dedup",
             "near_dedup"]
    vals = [r[s] for s in order]
    assert vals == sorted(vals, reverse=True), r
    assert r["input"] == len(docs.toPandas()) + 3

    # exact copies collapsed to one survivor (the min doc_id = the base);
    # the near-dup is clustered with it and dropped too
    survivors = set(kept.doc_id)
    assert base["doc_id"] in survivors
    assert {max_id + 1, max_id + 2}.isdisjoint(survivors)
    assert max_id + 3 not in survivors  # near-dup clustered away

    # decontamination dropped the benchmark members that passed quality
    # (they share all their shingles with themselves in the benchmark set)
    bench_ids = {row[0] for row in benchmark.select("doc_id").collect()}
    assert bench_ids.isdisjoint(survivors)


def test_curate_corpus_no_benchmark(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    kept = curate_corpus(docs, None).count()
    assert 0 < kept <= docs.count()


def test_curation_span_cut_stage(spark):
    """With cut_span_words set, boilerplate passages shared by surviving
    docs are removed in place and the report gains a span_cut stage."""
    from msi_preprocessing_pipeline_spark.plans.corpus import (
        CurationConfig, curate_corpus)

    boiler = " ".join(f"b{i}" for i in range(8))
    mk = lambda i, body: (i, f"{body} {boiler}")  # noqa: E731
    docs = spark.createDataFrame(
        [mk(i, " ".join(f"w{i}x{j}" for j in range(20)))
         for i in range(6)],
        "doc_id long, text string")
    cfg = CurationConfig(cut_span_words=8)
    out = curate_corpus(docs, benchmark=None, cfg=cfg, with_report=True)
    rows = out.collect()
    assert len(rows) == 6  # distinct bodies -> all docs survive dedup
    for r in rows:
        assert "b0" not in r["text"]  # boilerplate passage cut
        assert f"w{r['doc_id']}x0" in r["text"]  # body intact (normalized)
    assert cfg.report["span_cut"] == 6
    assert set(out.columns) == {"doc_id", "text"}

"""Deterministic sampling / group-stable splits / benchmark decontamination."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators import dedup
from msi_preprocessing_pipeline_spark.operators.sampling import (
    hash_sample, stable_split)

SF_DIR = "/root/testdata/sf0.001"


def test_hash_sample_deterministic_and_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = set(hash_sample(docs, "doc_id", 0.3, seed=3)
            .select("doc_id").toPandas().doc_id)
    b = set(hash_sample(docs.repartition(13), "doc_id", 0.3, seed=3)
            .select("doc_id").toPandas().doc_id)
    assert a == b and len(a) > 0
    # roughly the requested fraction (md5 uniformity)
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n
    # a different seed draws a different sample
    c = set(hash_sample(docs, "doc_id", 0.3, seed=4)
            .select("doc_id").toPandas().doc_id)
    assert a != c


def test_stable_split_is_group_stable_and_exhaustive(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = stable_split(ev, "user_id",
                       {"train": 0.8, "val": 0.1, "test": 0.1},
                       seed=42).select("user_id", "split").toPandas()
    per_user = out.groupby("user_id")["split"].nunique()
    assert (per_user == 1).all()  # every entity lands in exactly one split
    counts = out.drop_duplicates().split.value_counts()
    assert set(counts.index) <= {"train", "val", "test"}
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)


def test_decontaminate_flags_planted_overlap(spark):
    bench_text = ("the seven wonders of the ancient world include the great "
                  "pyramid of giza and the hanging gardens of babylon")
    rows = [
        ("t-clean-1", "completely unrelated text about distributed query "
                      "engines and columnar storage formats for analytics"),
        ("t-contam-1", "as we know " + bench_text + " according to legend"),
        ("t-contam-2", bench_text),
        ("t-clean-2", "another unrelated document mentioning the great "
                      "pyramid once but nothing else overlapping here ok"),
    ]
    train = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))
    bench = spark.createDataFrame(
        pd.DataFrame([("b-1", bench_text)], columns=["doc_id", "text"]))
    out = dedup.decontaminate(train, bench, k=5, min_common=3).toPandas()
    flagged = set(out.doc_id)
    assert flagged == {"t-contam-1", "t-contam-2"}
    exact = out[out.doc_id == "t-contam-2"]
    # the verbatim copy shares every benchmark shingle
    assert int(exact.max_overlap.iloc[0]) >= 10
    assert (out.n_matched_benchmarks == 1).all()


def test_decontaminate_respects_df_cap(spark):
    # a boilerplate phrase in every training doc must not cause flags once
    # capped away
    boiler = "shared boilerplate sentence appearing in every single document"
    train = spark.createDataFrame(pd.DataFrame(
        [(f"t-{i}", f"unique words {i} alpha beta gamma delta " + boiler)
         for i in range(20)], columns=["doc_id", "text"]))
    bench = spark.createDataFrame(pd.DataFrame(
        [("b-1", "totally different benchmark text " + boiler)],
        columns=["doc_id", "text"]))
    uncapped = dedup.decontaminate(train, bench, k=5, min_common=2).count()
    capped = dedup.decontaminate(train, bench, k=5, min_common=2,
                                 max_df=5).count()
    assert uncapped == 20 and capped == 0


def test_repetition_metrics_flags_boilerplate(spark):
    from msi_preprocessing_pipeline_spark.operators import text as tx

    rows = [
        ("varied", "alpha beta gamma delta epsilon zeta eta theta iota"),
        ("spam", "buy now buy now buy now buy now buy now buy now"),
        ("single", "word"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = tx.repetition_metrics(df, n=2).toPandas().set_index("doc_id")
    assert out.loc["spam", "top_ngram_frac"] > 0.4
    assert out.loc["spam", "dup_ngram_frac"] > 0.9
    assert out.loc["varied", "dup_ngram_frac"] == 0.0
    assert out.loc["single", "top_ngram_frac"] == 1.0


def test_hash_sample_fractions_are_nested(spark):
    # md5-band sampling is monotone in the threshold: sample(0.1) must be a
    # strict subset of sample(0.3) at the same seed — the property that makes
    # progressive corpus scaling reproducible (a 10% pilot is contained in
    # the later 30% run)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s10 = set(hash_sample(docs, "doc_id", 0.1, seed=9)
              .select("doc_id").toPandas().doc_id)
    s30 = set(hash_sample(docs, "doc_id", 0.3, seed=9)
              .select("doc_id").toPandas().doc_id)
    assert s10 < s30


def test_pii_metrics_and_redaction(spark):
    from msi_preprocessing_pipeline_spark.operators import text as tx
    rows = [
        (0, "mail me at a.b-c_1@ex-ample.co.uk or x@y.io now"),
        (1, "ssn 123-45-6789 phone 555.867.5309 ip 10.0.0.255"),
        (2, "no pii here, just 1234 and 12-34"),
        (3, "v4 999.999.999.999 is matched lexically (scrub, not validate)"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (tx.pii_metrics(df)
           .withColumn("red", tx.redact_pii())
           .toPandas().set_index("doc_id").sort_index())
    assert got.loc[0, "n_email"] == 2 and got.loc[0, "pii_total"] == 2
    assert (got.loc[1, ["n_ssn", "n_phone", "n_ipv4"]] == 1).all()
    assert got.loc[1, "n_email"] == 0 and got.loc[1, "pii_total"] == 3
    assert got.loc[2, "pii_total"] == 0
    assert got.loc[3, "n_ipv4"] == 1
    assert got.loc[0, "red"] == "mail me at <EMAIL> or <EMAIL> now"
    assert got.loc[1, "red"] == "ssn <SSN> phone <PHONE> ip <IPV4>"
    assert got.loc[2, "red"] == rows[2][1]

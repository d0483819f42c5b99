"""Data-quality expectations (operators/validate.py)."""

from pyspark.sql import functions as F  # noqa: F401

from msi_preprocessing_pipeline_spark.operators import validate as V


def test_validate_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, "ok", 10, "en"),
         (1, None, -5, "en"),     # dup id, null text, range violation
         (2, "ok", 20, "xx"),     # bad lang
         (3, "ok", 999999, "de")],  # range violation
        "doc_id long, text string, n_chars long, lang string")
    out = {r["rule"]: (r["n_violations"], r["passed"])
           for r in V.validate(df, [
               V.not_null("text"),
               V.unique("doc_id"),
               V.in_range("n_chars", 1, 1000),
               V.one_of("lang", ["en", "de"]),
           ]).collect()}
    assert out["not_null(text)"] == (1, False)
    assert out["unique(doc_id)"] == (1, False)
    assert out["in_range(n_chars,1,1000)"] == (2, False)
    assert out["one_of(lang,en|de)"] == (1, False)


def test_validate_all_pass_single_scan(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit("x").alias("s"))
    res = V.validate(df, [V.not_null("s"), V.unique("k"),
                          V.in_range("k", 0, 99)])
    assert all(r["passed"] for r in res.collect())
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_check_reference_counts_orphans(spark):
    facts = spark.createDataFrame([(1,), (2,), (9,), (9,), (None,)],
                                  "fk long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = V.check_reference(facts, "fk", dim, "pk").first()
    # two orphan 9s + one null = 3 (nulls never match a left-anti join)
    assert row["rule"] == "reference(fk)"
    assert row["n_violations"] == 3 and not row["passed"]


def test_check_reference_clean(spark):
    facts = spark.createDataFrame([(1,), (2,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,)], "pk long")
    row = V.check_reference(facts, "fk", dim, "pk").first()
    assert row["n_violations"] == 0 and row["passed"]


def test_validate_empty_relation_passes_vacuously(spark):
    df = spark.createDataFrame([], "k long, s string")
    out = V.validate(df, [V.not_null("s"), V.unique("k")]).collect()
    assert all(r["n_violations"] == 0 and r["passed"] for r in out)


def test_validate_duplicate_rule_rejected(spark):
    df = spark.createDataFrame([(1,)], "k long")
    import pytest
    with pytest.raises(ValueError, match="duplicate"):
        V.validate(df, [V.not_null("k"), V.not_null("k")])


def test_validate_two_regex_rules_same_column(spark):
    df = spark.createDataFrame([("src1",), ("xxx",)], "s string")
    out = {r["rule"]: r["n_violations"]
           for r in V.validate(df, [V.matches("s", r"^src"),
                                    V.matches("s", r"\d$")]).collect()}
    assert len(out) == 2 and all(v == 1 for v in out.values())


def test_check_reference_is_lazy_and_unionable(spark):
    facts = spark.createDataFrame([(1,), (9,)], "fk long")
    dim = spark.createDataFrame([(1,)], "pk long")
    rep = (V.check_reference(facts, "fk", dim, "pk")
           .unionByName(V.validate(facts, [V.not_null("fk")])))
    rows = {r["rule"]: r["n_violations"] for r in rep.collect()}
    assert rows == {"reference(fk)": 1, "not_null(fk)": 0}

"""script_census: per-script counts, dominant selection + ties, null
text, map-only plan, and Java↔RE2 script-class parity via DuckDB."""
import duckdb
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.text import (
    SCRIPTS_DEFAULT, script_census)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        "doc_id long, text string")


def test_counts_and_dominant(spark):
    got = {r["doc_id"]: r for r in script_census(_df(spark, [
        "Hello Привет 你好 مرحبا γειά",   # cyrillic wins (6 letters)
        "abcdef 字",                       # latin wins
        "12345 !!!",                       # no letters at all
        None,
    ])).collect()}
    r0 = got[0]
    assert (r0["n_latin"], r0["n_cyrillic"], r0["n_han"],
            r0["n_arabic"], r0["n_greek"]) == (5, 6, 2, 5, 4)
    assert r0["dominant_script"] == "Cyrillic"
    assert r0["n_letters"] == 22
    assert r0["dominant_frac_u"] == int(6 / 22 * 1e6 + 0.5)
    assert got[1]["dominant_script"] == "Latin"
    assert got[2]["dominant_script"] is None
    assert got[2]["n_letters"] == 0
    assert got[3]["dominant_script"] is None
    assert got[3]["n_letters"] == 0 and got[3]["n_latin"] == 0


def test_tie_breaks_to_smallest_name(spark):
    # 2 Latin letters vs 2 Greek letters: Greek < Latin lexicographically
    got = script_census(_df(spark, ["ab γε"])).collect()[0]
    assert got["dominant_script"] == "Greek"


def test_duckdb_re2_parity(spark):
    """The same script classes must count identically in DuckDB RE2 —
    the property the SQL oracle relies on."""
    text = "Hello Привет 你好 مرحبا γειά שלום 안녕 สวัสดี नमस्ते"
    spark_row = script_census(_df(spark, [text])).collect()[0]
    con = duckdb.connect()
    for s in SCRIPTS_DEFAULT:
        duck = con.execute(
            f"select length(regexp_replace(?, '[^\\p{{{s}}}]', '', 'g'))",
            [text]).fetchone()[0]
        assert spark_row[f"n_{s.lower()}"] == duck, s


def test_plan_is_map_only(spark):
    df = _df(spark, ["hello"])
    plan = script_census(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" not in plan

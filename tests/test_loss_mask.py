"""loss_mask: split-at-separator semantics, absent-separator and
null/empty handling, map-only plan pin."""
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.augment import loss_mask


def _df(spark):
    rows = [
        Row(doc_id=1, tokens=[4, 9, 7, 3, 2]),       # sep at pos 3
        Row(doc_id=2, tokens=[7, 1, 2]),             # sep first
        Row(doc_id=3, tokens=[1, 2, 3]),             # no sep
        Row(doc_id=4, tokens=[7]),                   # sep only
        Row(doc_id=5, tokens=[]),
        Row(doc_id=6, tokens=None),
        Row(doc_id=7, tokens=[4, 7, 1, 7, 2]),       # first sep wins
    ]
    return spark.createDataFrame(rows, "doc_id int, tokens array<int>")


def test_mask_semantics(spark):
    got = {r["doc_id"]: (r["mask"], r["n_prompt"], r["n_target"])
           for r in loss_mask(_df(spark), sep_id=7).collect()}
    assert got[1] == ([0, 0, 0, 1, 1], 3, 2)
    assert got[2] == ([0, 1, 1], 1, 2)
    assert got[3] == ([1, 1, 1], 0, 3)
    assert got[4] == ([0], 1, 0)
    assert got[5] == ([], 0, 0)
    assert got[6] == (None, 0, 0)
    assert got[7] == ([0, 0, 1, 1, 1], 2, 3)


def test_mask_lengths_consistent(spark):
    for r in loss_mask(_df(spark), sep_id=7).collect():
        if r["mask"] is not None:
            assert len(r["mask"]) == r["n_prompt"] + r["n_target"]
            assert sum(r["mask"]) == r["n_target"]


def test_plan_is_map_only(spark):
    plan = loss_mask(_df(spark), sep_id=7) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

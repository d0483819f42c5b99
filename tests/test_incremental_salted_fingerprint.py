"""salted_join identity, table fingerprint / Merkle bucket diff,
l-diversity, per-group k-sample, incremental refresh identities."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.incremental import (
    merge_additive, refresh_group_agg)
from msi_preprocessing_pipeline_spark.operators.joins import salted_join
from msi_preprocessing_pipeline_spark.operators.privacy import (
    l_diversity_report)
from msi_preprocessing_pipeline_spark.operators.sampling import (
    group_sample_k)
from msi_preprocessing_pipeline_spark.operators.validate import (
    table_diff_buckets, table_fingerprint)


def rows(df, *cols):
    out = [tuple(r) for r in (df.select(*cols) if cols else df).collect()]
    return sorted(out, key=lambda t: tuple((v is None, v) for v in t))


# ---------------------------------------------------------------- salted join

@pytest.fixture(scope="module")
def skewed(spark):
    # key 1 is hot (40 rows), key 2 modest, key 3 unmatched, null key
    left = spark.createDataFrame(
        [Row(k=1, uid=i, lv=i * 10) for i in range(40)]
        + [Row(k=2, uid=100 + i, lv=i) for i in range(5)]
        + [Row(k=3, uid=200, lv=7), Row(k=None, uid=201, lv=8)])
    right = spark.createDataFrame(
        [Row(k=1, rv="a"), Row(k=1, rv="b"),  # duplicate key rows
         Row(k=2, rv="c"), Row(k=4, rv="d"), Row(k=None, rv="e")])
    return left, right


def test_salted_join_inner_identity(skewed):
    left, right = skewed
    got = salted_join(left, right, "k", spread_col="uid", n_salt=7)
    want = left.join(right, "k", "inner")
    assert rows(got, "k", "uid", "lv", "rv") == \
        rows(want, "k", "uid", "lv", "rv")
    # hot key multiplicity preserved: 40 left rows x 2 right rows
    assert got.where("k = 1").count() == 80


def test_salted_join_left_identity(skewed):
    left, right = skewed
    got = salted_join(left, right, "k", spread_col="uid",
                      n_salt=5, how="left")
    want = left.join(right, "k", "left")
    assert rows(got, "k", "uid", "lv", "rv") == \
        rows(want, "k", "uid", "lv", "rv")
    # null-keyed and unmatched left rows survive exactly once
    assert got.where("uid = 201").count() == 1
    assert got.where("uid = 200").count() == 1


def test_salted_join_rejects_bad_args(skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="how"):
        salted_join(left, right, "k", "uid", how="full")
    with pytest.raises(ValueError, match="n_salt"):
        salted_join(left, right, "k", "uid", n_salt=0)


# ---------------------------------------------------------------- fingerprint

@pytest.fixture(scope="module")
def content(spark):
    return spark.createDataFrame(
        [Row(a=i, b=f"s{i % 5}", c=None if i % 7 == 0 else i * 3)
         for i in range(50)])


def test_fingerprint_order_invariant(content, spark):
    f1 = table_fingerprint(content).collect()[0]
    shuffled = content.orderBy(F.md5(F.col("a").cast("string")))
    f2 = table_fingerprint(shuffled.repartition(7)).collect()[0]
    assert f1 == f2
    assert f1["n_rows"] == 50


def test_fingerprint_detects_one_row_change(content):
    mod = content.withColumn(
        "c", F.when(F.col("a") == 13, 999).otherwise(F.col("c")))
    a = table_fingerprint(content).collect()[0]
    b = table_fingerprint(mod).collect()[0]
    assert a["n_rows"] == b["n_rows"] and a["sum_hash"] != b["sum_hash"]


def test_diff_buckets_equal_and_located(content):
    assert table_diff_buckets(content, content, 16).count() == 0
    broken = content.where("a <> 23")
    d = table_diff_buckets(content, broken, 16).collect()
    assert len(d) == 1
    assert d[0]["n_left"] == d[0]["n_right"] + 1
    assert d[0]["sum_left"] != d[0]["sum_right"]


def test_diff_buckets_schema_mismatch_raises(content):
    with pytest.raises(ValueError, match="column sets differ"):
        table_diff_buckets(content, content.drop("c"), 8)


# ---------------------------------------------------------------- l-diversity

def test_l_diversity_report(spark):
    df = spark.createDataFrame(
        # group (1,'x'): 3 distinct sensitive; (2,'y'): 1; (3,'z'):
        # 2 non-null (null doesn't defend the group)
        [Row(q1=1, q2="x", s="a"), Row(q1=1, q2="x", s="b"),
         Row(q1=1, q2="x", s="c"),
         Row(q1=2, q2="y", s="a"), Row(q1=2, q2="y", s="a"),
         Row(q1=3, q2="z", s="a"), Row(q1=3, q2="z", s="b"),
         Row(q1=3, q2="z", s=None)])
    r = l_diversity_report(df, ["q1", "q2"], "s", l=3).collect()[0]
    assert r["n_rows"] == 8 and r["n_groups"] == 3
    assert r["n_violating_groups"] == 2
    assert r["n_violating_rows"] == 5
    assert r["min_l"] == 1 and r["is_l_diverse"] is False


def test_l_diversity_empty_vacuous(spark):
    df = spark.createDataFrame([], "q int, s string")
    r = l_diversity_report(df, ["q"], "s", l=2).collect()[0]
    assert r["n_groups"] == 0 and r["is_l_diverse"] is True


# ------------------------------------------------------------- group sample k

def test_group_sample_k_caps_and_determinism(spark):
    df = spark.createDataFrame(
        [Row(id=i, g=i % 3) for i in range(60)]
        + [Row(id=100, g=9)])  # group smaller than k kept whole
    s1 = group_sample_k(df, "id", "g", k=4)
    assert s1.groupBy("g").count().agg(F.max("count")).collect()[0][0] <= 4
    assert s1.where("g = 9").count() == 1
    assert s1.count() == 13
    s2 = group_sample_k(df.repartition(13), "id", "g", k=4)
    assert rows(s1) == rows(s2)  # partitioning-independent
    s3 = group_sample_k(df, "id", "g", k=4, seed=1)
    assert rows(s1) != rows(s3)  # seed actually reseeds


# --------------------------------------------------------- incremental refresh

def _agg(rel):
    return (rel.groupBy("k")
            .agg(F.count("*").alias("n"),
                 F.coalesce(F.sum("v"), F.lit(0)).alias("sv"),
                 F.max("t").alias("mt")))


@pytest.fixture(scope="module")
def split_events(spark):
    hist = spark.createDataFrame(
        [Row(k=i % 5, v=i, t=i) for i in range(40)]
        + [Row(k=None, v=1, t=0), Row(k=None, v=2, t=5)])
    delta = spark.createDataFrame(
        [Row(k=1, v=100, t=50), Row(k=1, v=101, t=51),
         Row(k=7, v=5, t=60),          # brand-new entity
         Row(k=None, v=9, t=70)])      # null key touched by the delta
    return hist, delta


def test_refresh_group_agg_identity(split_events):
    hist, delta = split_events
    got = refresh_group_agg(hist, _agg(hist), delta, ["k"], _agg)
    want = _agg(hist.unionByName(delta))
    assert rows(got) == rows(want)


def test_refresh_untouched_rows_come_from_prev(split_events):
    hist, delta = split_events
    # poison prev for an untouched key: the splice must keep it verbatim
    prev = _agg(hist).withColumn(
        "sv", F.when(F.col("k") == 2, -777).otherwise(F.col("sv")))
    got = refresh_group_agg(hist, prev, delta, ["k"], _agg)
    assert got.where("k = 2").collect()[0]["sv"] == -777


def test_merge_additive_identity(split_events):
    hist, delta = split_events
    got = merge_additive(_agg(hist), _agg(delta), ["k"],
                         sum_cols=["n", "sv"], max_cols=["mt"])
    want = _agg(hist.unionByName(delta))
    assert rows(got) == rows(want)


def test_merge_additive_validates_columns(split_events):
    hist, delta = split_events
    with pytest.raises(ValueError, match="column classes"):
        merge_additive(_agg(hist), _agg(delta), ["k"],
                       sum_cols=["n"], max_cols=["mt"])

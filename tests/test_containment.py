"""containment_pairs: asymmetric containment vs a python mirror, the
superset case Jaccard misses, threshold, max_df cap."""
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.operators.dedup import (
    containment_pairs, ngram_jaccard_pairs)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        "doc_id long, text string")


def _shingles(text, k):
    w = text.lower().split()
    if len(w) < k:
        return {" ".join(w)}
    return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}


def test_superset_detection_where_jaccard_fails(spark):
    quote = "the quick brown fox jumps over the lazy dog tonight"
    tail = " ".join(f"filler{i} comment{i}" for i in range(30))
    page = "aggregator header text here now " + quote + " " + tail
    docs = _df(spark, [quote, page])
    cont = containment_pairs(docs, k=3, threshold=0.9).collect()
    assert len(cont) == 1
    r = cont[0]
    assert r["contain_ab_u"] == 1_000_000  # quote fully inside page
    assert r["contain_ba_u"] < 400_000
    # Jaccard at the same pair is small — below a 0.5 dedup threshold
    jac = ngram_jaccard_pairs(docs, k=3, threshold=0.0).collect()[0]
    assert jac["jaccard"] < 0.3


def test_matches_python_mirror(spark):
    rows = ["a b c d e f g", "c d e f g h i", "x y z w v u t",
            "a b c d e f g h i j k"]
    got = {(r["doc_a"], r["doc_b"]): r for r in
           containment_pairs(_df(spark, rows), k=3,
                             threshold=0.0).collect()}
    for (a, b), r in got.items():
        sa, sb = _shingles(rows[a], 3), _shingles(rows[b], 3)
        common = len(sa & sb)
        assert r["n_common"] == common
        assert r["n_a"] == len(sa) and r["n_b"] == len(sb)
        assert r["contain_ab_u"] == int(common / len(sa) * 1e6 + 0.5)


def test_threshold_filters(spark):
    rows = ["a b c d e", "a b c x y", "p q r s t"]
    high = containment_pairs(_df(spark, rows), k=2, threshold=0.99)
    low = containment_pairs(_df(spark, rows), k=2, threshold=0.1)
    assert high.count() < low.count()

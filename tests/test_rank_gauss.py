"""rank_gauss: exact Φ⁻¹((rank+0.5)/n) vs a numpy mirror, normality of
the output, null passthrough, partition invariance."""
import numpy as np
from pyspark.sql import Row

from msi_preprocessing_pipeline_spark.kernels.special import norm_ppf
from msi_preprocessing_pipeline_spark.operators.encoding import rank_gauss


def _df(spark, vals):
    return spark.createDataFrame(
        [Row(doc_id=i, v=x) for i, x in enumerate(vals)],
        "doc_id long, v double")


def test_matches_numpy_mirror(spark):
    vals = [float((i * 37) % 100) for i in range(50)]
    got = {r["doc_id"]: r["v_rg"]
           for r in rank_gauss(_df(spark, vals), "v", "doc_id").collect()}
    order = sorted(range(50), key=lambda i: (vals[i], i))
    for rank, i in enumerate(order):
        u = np.clip((rank + 0.5) / 50, 1e-6, 0.999999)
        assert got[i] == float(norm_ppf(np.array([u]))[0]), i


def test_output_is_standard_normal_shaped(spark):
    # heavily skewed input -> output quantiles match the normal ones
    vals = [float(2 ** (i % 17)) for i in range(500)]
    out = np.array([r["v_rg"] for r in
                    rank_gauss(_df(spark, vals), "v", "doc_id").collect()])
    assert abs(np.median(out)) < 0.05
    assert abs(np.mean(out)) < 0.05
    assert 0.9 < np.std(out) < 1.1


def test_null_passthrough(spark):
    got = {r["doc_id"]: r["v_rg"] for r in rank_gauss(
        _df(spark, [1.0, None, 3.0]), "v", "doc_id").collect()}
    assert got[1] is None
    assert got[0] is not None and got[2] is not None
    assert len(got) == 3


def test_partition_invariance(spark):
    vals = [float((i * 13) % 40) for i in range(120)]
    a = sorted(map(tuple,
                   rank_gauss(_df(spark, vals), "v", "doc_id").collect()))
    b = sorted(map(tuple,
                   rank_gauss(_df(spark, vals).repartition(9), "v",
                              "doc_id").collect()))
    assert a == b

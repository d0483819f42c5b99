"""Full fit+transform parity at the REFERENCE's true constants and sample
width (slow tier).

The reference ships 205,312-channel spectra
(``/root/reference/sample-data/raw/my-dataset1/``) and runs baseline windows
1500/500/100 (``components/spectrum/baseline.py:36-46``), component band
(1000, 3500) (``pipeline/gmm.py:178``) and a fixed 100,000-point GMM axis
(``pipeline/gmm.py:49``). The default test tier exercises the same code
paths at synthetic scale; this test pins that nothing breaks or diverges at
the real constants and channel width.
"""

import numpy as np
import pytest

from msi_preprocessing_pipeline_spark import oracle
from msi_preprocessing_pipeline_spark.kernels import synth
from msi_preprocessing_pipeline_spark.operators import spectrum as sp
from msi_preprocessing_pipeline_spark.plans.pipeline import FeaturePipeline
from msi_preprocessing_pipeline_spark.sources import synthetic

REF_CFG = oracle.PipelineConfig(
    baseline_max_width=1500, baseline_min_width=500, baseline_increment=100,
    component_band=(1000, 3500), gmm_axis_points=100_000)
SOURCES = {"src-000": 3, "src-001": 3}
CHANNELS = 205_312  # the reference sample-data channel width


@pytest.mark.slow
def test_reference_constants_parity(spark):
    df = sp.with_ts(synthetic.sequences_df(spark, SOURCES,
                                           base_channels=CHANNELS,
                                           partitions=6), REF_CFG)
    axes = synthetic.source_axes_for(SOURCES, CHANNELS)
    rows = synth.make_table(SOURCES, base_channels=CHANNELS)

    art_o, feats_o = oracle.run_pipeline(rows, axes, REF_CFG)
    pipe = FeaturePipeline(spark, axes, REF_CFG)
    art_s = pipe.fit(df)

    np.testing.assert_allclose(art_s.mz_axis, art_o.mz_axis, rtol=1e-12)
    np.testing.assert_allclose(art_s.pafft_reference, art_o.pafft_reference,
                               rtol=1e-7)
    np.testing.assert_allclose(art_s.tic_reference_tic,
                               art_o.tic_reference_tic, rtol=1e-7)
    np.testing.assert_allclose(art_s.gmm_mu, art_o.gmm_mu, rtol=1e-5)
    np.testing.assert_array_equal(art_s.merge_starts, art_o.merge_starts)
    # the reference band (1000, 3500) must actually constrain the model here
    assert art_s.gmm_mu.size == art_o.gmm_mu.size

    got = pipe.transform(df, [art_s]).toPandas()
    by_doc = {r.doc_id: np.asarray(r.features, dtype=np.float32)
              for r in got.itertuples()}
    assert len(by_doc) == sum(SOURCES.values())
    for (doc_id, *_), expected in zip(rows, feats_o):
        np.testing.assert_allclose(by_doc[doc_id], expected, rtol=2e-4,
                                   atol=1e-3, err_msg=doc_id)

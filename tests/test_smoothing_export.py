"""Savitzky–Golay / peak-detection kernels and the CSV exporter (W3/W4/S8)."""

import glob

import numpy as np
import numpy.testing as npt
import pandas as pd

from msi_preprocessing_pipeline_spark.kernels import smoothing
from msi_preprocessing_pipeline_spark.operators import spectrum as sp


def test_savgol_preserves_polynomial():
    # an order-2 S-G filter reproduces quadratics exactly (away from edges)
    x = np.arange(100, dtype=float)
    y = 0.02 * x ** 2 + 3.0
    sm = smoothing.savgol_smooth(y, window=7, order=2)
    npt.assert_allclose(sm[5:-5], y[5:-5], rtol=1e-10)


def test_savgol_smooths_noise_and_clips():
    rng = np.random.RandomState(2)
    y = np.sin(np.linspace(0, 6, 500)) + rng.randn(500) * 0.3
    sm = smoothing.savgol_smooth(y, window=11, order=2)
    assert np.all(sm >= 0)
    # high-frequency energy reduced
    assert np.abs(np.diff(sm)).sum() < np.abs(np.diff(np.clip(y, 0, None))).sum()


def test_detect_peaks_finds_gaussians():
    x = np.linspace(0, 100, 1000)
    y = (np.exp(-((x - 25) ** 2) / 2) * 10
         + np.exp(-((x - 60) ** 2) / 4) * 5)
    idx, pmz, pct = smoothing.detect_peaks(x, y)
    assert any(abs(m - 25) < 1 for m in pmz)
    assert any(abs(m - 60) < 1 for m in pmz)


def test_detect_peaks_flat_input():
    x = np.arange(10, dtype=float)
    idx, pmz, pct = smoothing.detect_peaks(x, np.zeros(10))
    assert len(pmz) >= 0  # no crash; any flat "extrema" carry zero counts


def test_smooth_and_peaks_stages(spark):
    pdf = pd.DataFrame({
        "doc_id": ["d1", "d2"],
        "spectrum": [
            (np.exp(-((np.arange(300) - 100.0) ** 2) / 8) * 50).astype(np.float32),
            (np.exp(-((np.arange(300) - 200.0) ** 2) / 8) * 80).astype(np.float32),
        ],
    })
    df = spark.createDataFrame(pdf)
    mz = np.linspace(700.0, 800.0, 300)
    smoothed = sp.smooth_stage(df, "spectrum", window=7, order=2)
    peaks = sp.detect_peaks_stage(smoothed, mz, vec_col="smoothed").toPandas()
    got = {r.doc_id: np.asarray(r.peak_mz) for r in peaks.itertuples()}
    assert np.min(np.abs(got["d1"] - mz[100])) < 1.0
    assert np.min(np.abs(got["d2"] - mz[200])) < 1.0


def test_export_csv(spark, tmp_path):
    pdf = pd.DataFrame({"features": [[1.5, 2.0], [3.25, 4.0]]})
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "export")
    sp.export_csv(df, "features", out, fmt="%.6e")
    lines = []
    for part in glob.glob(f"{out}/part-*"):
        with open(part) as f:
            lines.extend(ln.strip() for ln in f if ln.strip())
    parsed = sorted(tuple(float(x) for x in ln.split(",")) for ln in lines)
    assert parsed == [(1.5, 2.0), (3.25, 4.0)]

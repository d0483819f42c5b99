"""MATLAB-alike exact quantiles.

Semantics per reference ``components/stats.py:4-54``: MATLAB treats the first
sorted element as the ``0.5/n`` quantile and the last as ``(n-0.5)/n``; the
requested quantile is remapped linearly onto numpy's 0..1 plotting positions
and clipped, then evaluated with linear interpolation.

These are EXACT quantiles — the allclose-compat path must never use
``percentile_approx`` (see SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np


def mquantile(values: np.ndarray, q) -> np.ndarray:
    """Exact MATLAB-alike quantile(s) of ``values`` at ``q`` in [0, 1]."""
    values = np.asarray(values)
    n = float(values.size)
    scale = n / (n - 1.0)
    offset = -0.5 / (n - 1.0)
    remapped = np.clip(scale * np.asarray(q, dtype=float) + offset, 0.0, 1.0)
    return np.percentile(values, 100.0 * remapped)


def miqr(values: np.ndarray, rng=(25, 75)) -> float:
    """Inter-quantile range using MATLAB-alike quantiles (reference
    ``components/stats.py:52-54``)."""
    lo, hi = mquantile(values, 0.01 * np.asarray(rng, dtype=float))
    return hi - lo


def median_and_iqr(values: np.ndarray) -> tuple[float, float]:
    """(median, IQR) in one pass — reference ``components/spectrum/outlier.py:12-15``."""
    q25, med, q75 = mquantile(values, [0.25, 0.5, 0.75])
    return med, q75 - q25


def interp_quantile_from_sorted(n: int, q: float) -> tuple[int, int, float]:
    """Plan an exact linear-interpolation quantile lookup over a sorted column.

    Returns ``(lo_rank, hi_rank, frac)`` (0-based ranks) such that
    ``value = sorted[lo] + frac * (sorted[hi] - sorted[lo])`` reproduces
    ``np.percentile(..., method='linear')``. Used by the distributed exact
    quantile operator so the Spark path matches numpy bit-for-bit.
    """
    pos = q * (n - 1)
    lo = int(np.floor(pos))
    hi = min(lo + 1, n - 1)
    frac = pos - lo
    return lo, hi, frac


def matlab_positions(n: int, q) -> np.ndarray:
    """The clipped remapped quantile positions used by :func:`mquantile`."""
    n = float(n)
    return np.clip(np.asarray(q, dtype=float) * n / (n - 1.0) - 0.5 / (n - 1.0), 0.0, 1.0)

"""Adaptive-window baseline estimation and removal.

Numerical semantics per reference ``components/spectrum/baseline.py:11-89``:
walk the channel axis growing a window from ``min_width`` in ``increment``
steps until a significant Pearson trend (p < 0.05) appears or the window
reaches ``max_width``; each closed segment contributes its 10th-percentile as
a baseline anchor; anchor m/z positions are segment-boundary midpoints; a
cubic interpolant of the anchors is subtracted and the result clipped at zero
and cast to float32.

Golden-tested against the reference's
``test/components/spectrum/test_baseline.py:87-133`` vector.
"""

from __future__ import annotations

import numpy as np

from .special import interp1d_cubic_or_linear, pearsonr_p


def _has_trend(x: np.ndarray, y: np.ndarray, significance: float = 0.05) -> bool:
    with np.errstate(all="ignore"):
        _, p = pearsonr_p(x, y)
    return bool(p < significance)


def _segment_anchors(mzs: np.ndarray, counts: np.ndarray, max_width: int,
                     min_width: int, increment: int):
    """Close adaptive segments; return (10th-pct estimates, widths)."""
    n = mzs.size
    estimates: list[float] = []
    widths: list[int] = []
    start, end = 0, min(min_width, n)
    while end <= n:
        seg_y = counts[start:end]
        seg_x = mzs[start:end]
        if _has_trend(seg_x, seg_y) or seg_y.size >= max_width:
            estimates.append(np.percentile(seg_y, 10.0))
            widths.append(seg_y.size)
            start, end = end, end + min_width
        else:
            end = min(end + increment, n + 1)
    if start < n:
        tail = counts[start:]
        estimates.append(np.percentile(tail, 10.0))
        widths.append(tail.size)
    return np.asarray(estimates), np.asarray(widths)


def _anchor_mzs(widths: np.ndarray, mzs: np.ndarray) -> np.ndarray:
    """Anchor positions: midpoints between consecutive segment end indices,
    with half-of-first-segment and last-end-to-axis-end midpoint at the
    extremes (reference ``baseline.py:55-66``)."""
    ends = np.cumsum(widths) - 1
    inner = mzs[((ends[2:] + ends[1:-1]) * 0.5).astype(int)]
    first = mzs[int((ends[0] - 1) * 0.5)]
    last = (mzs[ends[-1]] + mzs[-1]) * 0.5
    return np.hstack(([first], inner, [last]))


def remove_baseline(mzs: np.ndarray, counts: np.ndarray,
                    max_width: int = 1500, min_width: int = 500,
                    increment: int = 100) -> np.ndarray:
    """Estimate and subtract the adaptive baseline from one spectrum.

    Returns a float32 array, clipped at zero (reference
    ``baseline.py:73-74,88-89``).
    """
    mzs = np.ravel(np.asarray(mzs, dtype=float))
    counts = np.ravel(np.asarray(counts, dtype=float))
    estimates, widths = _segment_anchors(mzs, counts, max_width, min_width,
                                         increment)
    anchors = _anchor_mzs(widths, mzs)
    model = interp1d_cubic_or_linear(anchors, estimates)
    cleaned = np.clip(counts - model(mzs), a_min=0.0, a_max=None)
    return cleaned.astype(np.float32)

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


class _TrendScanner:
    """O(1)-per-window Pearson trend probe via prefix sums.

    The adaptive segmentation probes hundreds of overlapping windows per row;
    recomputing the correlation from scratch each time is the dominant cost.
    Prefix sums over globally-centered x/y (centering bounds the cancellation
    error) give every window's r in O(1); the p-value is the same two-sided
    Student-t transform :func:`..special.pearsonr_p` applies.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray):
        xc = x - x.mean()
        yc = y - y.mean()
        z = np.zeros(1)
        self.cx = np.concatenate((z, np.cumsum(xc)))
        self.cy = np.concatenate((z, np.cumsum(yc)))
        self.cxx = np.concatenate((z, np.cumsum(xc * xc)))
        self.cyy = np.concatenate((z, np.cumsum(yc * yc)))
        self.cxy = np.concatenate((z, np.cumsum(xc * yc)))

    def has_trend(self, start: int, end: int,
                  significance: float = 0.05) -> bool:
        m = end - start
        if m < 3:
            return False
        sx = self.cx[end] - self.cx[start]
        sy = self.cy[end] - self.cy[start]
        sxx = self.cxx[end] - self.cxx[start]
        syy = self.cyy[end] - self.cyy[start]
        sxy = self.cxy[end] - self.cxy[start]
        num = m * sxy - sx * sy
        den = (m * sxx - sx * sx) * (m * syy - sy * sy)
        if den <= 0.0:
            return False  # constant window → undefined r → no trend
        r = max(-1.0, min(1.0, num / np.sqrt(den)))
        if abs(r) == 1.0:
            return True
        df = m - 2
        t = abs(r) * np.sqrt(df / (1.0 - r * r))
        from .special import student_t_sf
        return 2.0 * student_t_sf(float(t), df) < significance


def _segment_anchors(mzs: np.ndarray, counts: np.ndarray, max_width: int,
                     min_width: int, increment: int, estimator=None):
    """Close adaptive segments; return (10th-pct estimates, widths).

    ``estimator`` overrides the per-segment baseline estimate (the reference
    tests inject the original MATLAB quantiles this way)."""
    estimate = estimator or (lambda seg: _percentile10(seg))
    n = mzs.size
    scanner = _TrendScanner(mzs, counts)
    estimates: list[float] = []
    widths: list[int] = []
    start, end = 0, min(min_width, n)
    while end <= n:
        size = end - start
        if scanner.has_trend(start, end) or size >= max_width:
            estimates.append(estimate(counts[start:end]))
            widths.append(size)
            start, end = end, end + min_width
        else:
            end = min(end + increment, n + 1)
    if start < n:
        estimates.append(estimate(counts[start:]))
        widths.append(n - start)
    return np.asarray(estimates), np.asarray(widths)


def _percentile10(values: np.ndarray) -> float:
    """``np.percentile(values, 10, method='linear')`` via partition — same
    arithmetic (sorted[k] + frac·(sorted[k+1]−sorted[k])), ~10× less
    dispatch overhead in this per-segment hot loop."""
    m = values.size
    if m == 1:
        return float(values[0])
    pos = 0.1 * (m - 1)
    k = int(pos)
    frac = pos - k
    if frac == 0.0:
        return float(np.partition(values, k)[k])
    part = np.partition(values, (k, k + 1))
    return float(part[k] + frac * (part[k + 1] - part[k]))


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
                    increment: int = 100, estimator=None) -> np.ndarray:
    """Estimate and subtract the adaptive baseline from one spectrum.

    Returns a float32 array, clipped at zero (reference
    ``baseline.py:73-74,88-89``).
    """
    mzs = np.ravel(np.asarray(mzs, dtype=float))
    counts = np.ravel(np.asarray(counts, dtype=float))
    estimates, widths = _segment_anchors(mzs, counts, max_width, min_width,
                                         increment, estimator=estimator)
    anchors = _anchor_mzs(widths, mzs)
    model = interp1d_cubic_or_linear(anchors, estimates)
    cleaned = np.clip(counts - model(mzs), a_min=0.0, a_max=None)
    return cleaned.astype(np.float32)

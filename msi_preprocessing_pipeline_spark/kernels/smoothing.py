"""Savitzky–Golay smoothing and gradient peak detection.

Both are defined-but-unused ("dead code") in the reference DAG; they are part
of its operator surface nonetheless, so the engine carries them as optional
per-row transforms:

* :func:`savgol_smooth` — least-squares polynomial filter via the normal
  equations, same-mode convolution, clip at zero
  (reference ``components/spectrum/smoothing.py:4-23``).
* :func:`detect_peaks` — first/second ``np.gradient``, sign-change extrema,
  argmax among {left, center, right} candidates
  (reference ``components/spectrum/peak.py:15-34``).
"""

from __future__ import annotations

import numpy as np


def savgol_filter_coefficients(window: int, order: int) -> np.ndarray:
    """Smoothing-filter row of the pseudo-inverse of the Vandermonde normal
    equations (the 0th-derivative Savitzky–Golay coefficients)."""
    half = (window - 1) / 2
    offsets = np.arange(-half, half + 1)
    design = np.vander(offsets, order + 1, increasing=True)
    solution, *_ = np.linalg.lstsq(design.T @ design, design.T, rcond=None)
    return solution[0]


def savgol_smooth(counts: np.ndarray, window: int = 5,
                  order: int = 2) -> np.ndarray:
    """Smooth one spectrum; non-negative output, same length."""
    counts = np.ravel(np.asarray(counts, dtype=float))
    coeffs = savgol_filter_coefficients(window, order)
    smoothed = np.clip(np.convolve(counts, coeffs, "same"), 0.0, None)
    return smoothed


def detect_peaks(mzs: np.ndarray, counts: np.ndarray):
    """Gradient peak detection → (indices, peak_mzs, peak_counts)."""
    mzs = np.ravel(np.asarray(mzs, dtype=float))
    counts = np.ravel(np.asarray(counts, dtype=float))
    d1 = np.gradient(counts)
    d2 = np.gradient(d1)
    extrema = np.nonzero(d1[:-1] * d1[1:] <= 0)[0]
    if extrema.size == 0:
        empty = np.array([], dtype=np.int64)
        return empty, mzs[empty], counts[empty]
    candidates = np.nonzero(d2[extrema] < 0)[0]
    right = np.clip(candidates + 1, 0, extrema.size - 1)
    left = np.clip(candidates - 1, 0, extrema.size - 1)
    stacked = np.vstack([counts[extrema[left]],
                         counts[extrema[candidates]],
                         counts[extrema[right]]])
    winner = np.argmax(stacked, axis=0)
    indices = np.unique(np.sort(np.concatenate([
        extrema[left[winner == 0]],
        extrema[candidates[winner == 1]],
        extrema[right[winner == 2]],
    ])))
    return indices, mzs[indices], counts[indices]

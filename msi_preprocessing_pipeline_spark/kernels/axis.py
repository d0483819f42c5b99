"""Resampling-axis estimation and 1-D linear resampling.

Reproduces the numerical semantics of reference
``components/spectrum/resampling.py:6-62`` (robust iterative linear fit of
tick distances over a centered/scaled domain, then either an arithmetic or a
quadratic "modelled ticks" axis) and ``bin/resampling.py:16-23`` (per-row
``np.interp`` + float32 cast). Golden-tested against the reference's
``test/components/spectrum/test_resampling.py:24-64`` vectors.
"""

from __future__ import annotations

import numpy as np

_MAX_REFIT_PASSES = 9
_EQUALIZED_RATIO = 1000.0


def _scaled_domain(n: int) -> np.ndarray:
    # symmetric grid -1..1 with n points, step 2/(n-1)
    return np.arange(1.0 - n, n + 1.0, 2.0) / (n - 1.0)


def _robust_linear_fit(ticks: np.ndarray) -> np.ndarray:
    """Iteratively refit a line to tick distances, dropping points whose
    squared residual exceeds twice the mean squared residual; stop when the
    kept-set size stabilizes (≤ 1 + 9 passes)."""
    domain = _scaled_domain(ticks.size)
    kept = np.ones(ticks.size, dtype=bool)

    def fit_once(mask):
        coeffs = np.polyfit(domain[mask], ticks[mask], 1)
        sq_res = (np.polyval(coeffs, domain) - ticks) ** 2
        return coeffs, sq_res <= 2.0 * np.mean(sq_res)

    coeffs, kept = fit_once(kept)
    prev_count = np.inf
    for _ in range(_MAX_REFIT_PASSES):
        if np.sum(kept) == prev_count:
            break
        prev_count = np.sum(kept)
        coeffs, kept = fit_once(kept)
    return coeffs


def estimate_new_axis(old_axis: np.ndarray, number_of_ticks: int,
                      axis_limits) -> np.ndarray:
    """Estimate a resampling axis with ``number_of_ticks`` points over
    ``axis_limits`` from the tick structure of ``old_axis``."""
    old_axis = np.asarray(old_axis, dtype=float)
    limits = np.asarray(axis_limits, dtype=float)
    ticks = np.diff(old_axis)
    coeffs = _robust_linear_fit(ticks)
    domain = _scaled_domain(ticks.size)
    # tick size predicted at both domain ends
    end_ticks = np.polyval(coeffs, [domain[0], domain[-1]])

    span = np.diff(limits)  # 1-element array, broadcasting preserved on purpose
    if np.abs(np.mean(end_ticks) / np.diff(end_ticks)) > _EQUALIZED_RATIO:
        # ticks are effectively constant → arithmetic axis
        return limits[0] + np.arange(number_of_ticks) * span / number_of_ticks
    # quadratic tick-growth model: increments grow linearly from end_ticks[0]
    # to end_ticks[1]; closed-form cumulative sum below
    lin_scale = span * 2.0 / np.sum(end_ticks) / (number_of_ticks - 1)
    quad_scale = np.diff(end_ticks) * lin_scale / (number_of_ticks - 2)
    k = np.arange(number_of_ticks - 1)
    quadratic_part = ((k - 1.0) * k / 2.0) * quad_scale
    linear_part = k * (lin_scale * end_ticks[0])
    return np.hstack([limits[0] + linear_part + quadratic_part, [limits[1]]])


def resample_row(new_axis: np.ndarray, old_axis: np.ndarray,
                 counts: np.ndarray) -> np.ndarray:
    """Linear 1-D resample of one spectrum onto ``new_axis``; float32 output
    per the reference stage-boundary cast (``bin/resampling.py:22``)."""
    return np.interp(new_axis, old_axis, counts).astype(np.float32)

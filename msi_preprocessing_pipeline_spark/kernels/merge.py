"""Gaussian-component merging and feature-column merging.

Numerical semantics per reference ``components/spectrum/model.py:44-106``:
components sorted by mean are greedily grouped — a group takes at most
``max_components`` consecutive components whose means lie within
``n_sigmas``·σ of the group leader's mean; the merged component has the summed
weight, a moment-matched sigma, and the mean of the group's highest-peak
member. ``apply_merging`` sums the matching feature columns per group
(float32 output).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

_SQRT_2PI = np.sqrt(2.0 * np.pi)


class MergedModel(NamedTuple):
    starts: np.ndarray   # int, start column index per merged group
    lengths: np.ndarray  # int, run length per merged group
    mu: np.ndarray
    sig: np.ndarray
    w: np.ndarray


def _group_stats(mu: np.ndarray, sig: np.ndarray, w: np.ndarray):
    total_w = float(np.sum(w))
    blended_mean = float(np.sum(w * mu) / total_w)
    second_moment = np.sum(w * (mu ** 2 + sig ** 2)) / total_w
    new_sig = float(np.sqrt(second_moment - blended_mean ** 2))
    # output mean = mean of the member with the highest peak amplitude
    peaks = w / (sig * _SQRT_2PI)
    new_mu = float(mu[int(np.nonzero(np.max(peaks) == peaks)[0][0])])
    return new_mu, new_sig, total_w


def merge_components(mu: np.ndarray, sig: np.ndarray, w: np.ndarray,
                     max_components: int = 4, n_sigmas: int = 4) -> MergedModel:
    """Greedy adjacent-component merge (reference ``model.py:81-99``)."""
    mu = np.ravel(np.asarray(mu, dtype=float))
    sig = np.ravel(np.asarray(sig, dtype=float))
    w = np.ravel(np.asarray(w, dtype=float))
    k = mu.size
    starts, lengths, out_mu, out_sig, out_w = [], [], [], [], []
    start = 0
    while start < k:
        probe_end = min(start + max_components, k)
        reach = mu[start] + n_sigmas * sig[start]
        size = int(np.sum(mu[start:probe_end] <= reach))
        sl = slice(start, start + size)
        m, s, wt = _group_stats(mu[sl], sig[sl], w[sl])
        starts.append(start)
        lengths.append(size)
        out_mu.append(m)
        out_sig.append(s)
        out_w.append(wt)
        start += size
    return MergedModel(
        starts=np.asarray(starts, dtype=np.int64),
        lengths=np.asarray(lengths, dtype=np.int64),
        mu=np.asarray(out_mu), sig=np.asarray(out_sig), w=np.asarray(out_w),
    )


def apply_merging(features: np.ndarray, starts: np.ndarray,
                  lengths: np.ndarray) -> np.ndarray:
    """Sum feature columns ``[start, start+length)`` per merged group.

    Vectorized with ``np.add.reduceat`` when the groups tile the column range
    contiguously (the output of :func:`merge_components` always does);
    otherwise falls back to per-group slicing. float32 output per reference
    ``model.py:106``.
    """
    features = np.atleast_2d(np.asarray(features))
    starts = np.ravel(np.asarray(starts, dtype=np.int64))
    lengths = np.ravel(np.asarray(lengths, dtype=np.int64))
    contiguous = (
        starts.size > 0
        and starts[0] == 0
        and np.array_equal(starts[1:], (starts + lengths)[:-1])
        and starts[-1] + lengths[-1] == features.shape[1]
    )
    if contiguous:
        merged = np.add.reduceat(features, starts, axis=1)
    else:
        merged = np.hstack([
            features[:, s:s + l].sum(axis=1, keepdims=True)
            for s, l in zip(starts, lengths)
        ])
    return merged.astype(np.float32)

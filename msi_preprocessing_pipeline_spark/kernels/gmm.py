"""Deterministic EM Gaussian-mixture fitting.

Re-implements the reference's MATLAB compiled-runtime boundary
(``components/matlab_legacy.py:61-118``) from published semantics — the
MATLAB source is unavailable, so THIS implementation is the spec and the
oracle (SURVEY.md §2.9, §7 Phase 4):

* :func:`estimate_spectrum_gmm` — decompose a (baseline-removed, non-negative)
  mean spectrum into Gaussian peaks. Follows the signal-partitioning idea of
  Polanski et al. (Gaussian mixture modeling for MSI): split the spectrum into
  independent segments at zero-signal valleys, then run weighted EM per
  segment with BIC model selection. Everything is closed-form initialized —
  no RNG anywhere, so results are reproducible bit-for-bit.
* :func:`find_thresholds` — 1-D GMM decomposition of a feature distribution;
  thresholds are the pdf crossings between adjacent components (the
  ``fetch_thresholds`` analog used by amplitude/variance filtering,
  reference ``pipeline/gmm.py:161,173``).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import NamedTuple

import numpy as np

_SQRT_2PI = np.sqrt(2.0 * np.pi)
_EM_MAX_ITER = 300
_EM_TOL = 1e-10

# Driver-side EM is single-threaded numpy; the BIC loop fits k = 1..k_cap
# INDEPENDENT candidates, so they run concurrently on driver cores (numpy
# ufuncs release the GIL).  Each candidate's float ops are untouched —
# results stay bit-identical, only wall time changes.
_EM_POOL: ThreadPoolExecutor | None = None


def _em_pool() -> ThreadPoolExecutor:
    global _EM_POOL
    if _EM_POOL is None:
        _EM_POOL = ThreadPoolExecutor(
            max_workers=min(16, os.cpu_count() or 4),
            thread_name_prefix="gmm-em")
    return _EM_POOL


class GmmModel(NamedTuple):
    mu: np.ndarray
    sig: np.ndarray
    w: np.ndarray  # intensity-scaled weights: sum(w) ≈ total signal mass


def _weighted_quantile_positions(x: np.ndarray, weights: np.ndarray,
                                 k: int) -> np.ndarray:
    """k deterministic init means at weighted quantiles (i+0.5)/k."""
    order = np.argsort(x, kind="stable")
    cw = np.cumsum(weights[order])
    cw = cw / cw[-1]
    targets = (np.arange(k) + 0.5) / k
    idx = np.searchsorted(cw, targets, side="left")
    return x[order][np.clip(idx, 0, x.size - 1)].astype(float)


def _em_weighted(x: np.ndarray, weights: np.ndarray, k: int,
                 sigma_floor: float):
    """Weighted EM for a k-component 1-D GMM. Returns (mu, sig, mix, loglik)."""
    total = np.sum(weights)
    mu = _weighted_quantile_positions(x, weights, k)
    spread = np.sqrt(np.sum(weights * (x - np.average(x, weights=weights)) ** 2)
                     / total)
    sig = np.full(k, max(spread / max(k, 1), sigma_floor))
    mix = np.full(k, 1.0 / k)
    prev_ll = -np.inf
    # two reusable (n, k) buffers instead of ~8 fresh temporaries per
    # iteration; every arithmetic op keeps the ORIGINAL operand order
    # (e.g. ``(-0.5 * z) * z``), so values are bit-identical
    n = x.size
    xc = x[:, None]
    wc = weights[:, None]
    A = np.empty((n, k))
    B = np.empty((n, k))
    for _ in range(_EM_MAX_ITER):
        # E-step in log space for stability
        np.subtract(xc, mu[None, :], out=A)
        np.divide(A, sig[None, :], out=A)            # A = z
        np.multiply(A, -0.5, out=B)
        np.multiply(B, A, out=B)                     # B = -0.5*z*z
        np.subtract(B, np.log(sig[None, :] * _SQRT_2PI), out=B)
        np.add(B, np.log(mix[None, :]), out=B)       # B = log_joint
        log_norm = np.logaddexp.reduce(B, axis=1)
        ll = float(np.sum(weights * log_norm))
        np.subtract(B, log_norm[:, None], out=B)
        np.exp(B, out=B)
        np.multiply(B, wc, out=B)                    # B = resp
        nk = B.sum(axis=0)
        nk = np.maximum(nk, 1e-300)
        np.multiply(B, xc, out=A)
        mu = A.sum(axis=0) / nk
        np.subtract(xc, mu[None, :], out=A)
        np.multiply(A, A, out=A)
        np.multiply(B, A, out=A)                     # A = resp*(x-mu)^2
        var = A.sum(axis=0) / nk
        sig = np.maximum(np.sqrt(var), sigma_floor)
        mix = nk / total
        if abs(ll - prev_ll) <= _EM_TOL * max(1.0, abs(ll)):
            break
        prev_ll = ll
    return mu, sig, mix, ll


def _bic(ll: float, k: int, n_eff: float) -> float:
    return -2.0 * ll + (3.0 * k - 1.0) * np.log(max(n_eff, 2.0))


def fit_gmm_1d(x: np.ndarray, weights: np.ndarray | None = None,
               max_components: int = 10,
               sigma_floor: float | None = None):
    """BIC-selected weighted 1-D GMM. Returns (mu, sig, mix) sorted by mu."""
    x = np.ravel(np.asarray(x, dtype=float))
    if weights is None:
        weights = np.ones_like(x)
    weights = np.ravel(np.asarray(weights, dtype=float))
    keep = weights > 0
    x, weights = x[keep], weights[keep]
    if x.size == 0:
        return np.array([]), np.array([]), np.array([])
    if sigma_floor is None:
        uniq = np.unique(x)
        sigma_floor = float(np.min(np.diff(uniq)) / 2.0) if uniq.size > 1 \
            else max(1e-6, abs(float(uniq[0])) * 1e-6)
        sigma_floor = max(sigma_floor, 1e-12)
    n_distinct = np.unique(x).size
    k_cap = int(min(max_components, n_distinct))
    best = None
    n_eff = float(np.sum(weights))
    ks = list(range(1, max(k_cap, 1) + 1))
    if len(ks) > 1 and x.size >= 256:
        # independent candidates run concurrently (bit-identical per
        # candidate); selection still scans in ascending-k order
        futs = [_em_pool().submit(_em_weighted, x, weights, k, sigma_floor)
                for k in ks]
        fits = [f.result() for f in futs]
    else:
        fits = [_em_weighted(x, weights, k, sigma_floor) for k in ks]
    for k, (mu, sig, mix, ll) in zip(ks, fits):
        score = _bic(ll, k, n_eff)
        if best is None or score < best[0] - 1e-9:
            best = (score, mu, sig, mix)
    _, mu, sig, mix = best
    order = np.argsort(mu, kind="stable")
    mu, sig, mix = mu[order], sig[order], mix[order]
    live = mix > 1e-10
    return mu[live], sig[live], mix[live]


def _signal_segments(spectrum: np.ndarray, rel_threshold: float = 1e-4,
                     max_segment_channels: int = 4000):
    """Contiguous channel runs where the signal exceeds
    ``rel_threshold * max(spectrum)``; long runs are split at their lowest
    interior valley so per-segment EM stays small."""
    thr = rel_threshold * float(np.max(spectrum))
    above = np.concatenate(([False], spectrum > thr, [False]))
    flips = np.flatnonzero(np.diff(above.astype(np.int8)))
    segments = list(zip(flips[0::2].tolist(), flips[1::2].tolist()))
    # split oversized runs at the minimum interior channel
    out = []
    stack = segments[::-1]
    while stack:
        s, e = stack.pop()
        if e - s > max_segment_channels:
            interior = spectrum[s + 1:e - 1]
            cut = s + 1 + int(np.argmin(interior))
            stack.append((cut, e))
            out.append((s, cut))
        else:
            out.append((s, e))
    out.sort()
    return out


def estimate_spectrum_gmm(mzs: np.ndarray, spectrum: np.ndarray,
                          max_components_per_segment: int = 8,
                          rel_threshold: float = 1e-4) -> GmmModel:
    """Decompose a mean spectrum into Gaussian peaks (the ``estimate_gmm``
    analog, reference ``components/matlab_legacy.py:99-118``).

    Weights are intensity-scaled: ``sum_i w_i · N(x; μ_i, σ_i)`` approximates
    the spectrum, so downstream convolution features carry intensity units.
    """
    mzs = np.ravel(np.asarray(mzs, dtype=float))
    spectrum = np.ravel(np.asarray(spectrum, dtype=float))
    all_mu, all_sig, all_w = [], [], []
    tick = float(np.median(np.diff(mzs))) if mzs.size > 1 else 1.0
    for s, e in _signal_segments(spectrum, rel_threshold):
        seg_x = mzs[s:e]
        seg_y = spectrum[s:e]
        if seg_x.size < 2 or np.sum(seg_y) <= 0:
            continue
        mass = float(np.trapz(seg_y, seg_x))
        if mass <= 0:
            continue
        # at most one component per ~5 channels, at least 1
        k_cap = int(min(max_components_per_segment, max(1, seg_x.size // 5)))
        mu, sig, mix = fit_gmm_1d(seg_x, seg_y, max_components=k_cap,
                                  sigma_floor=tick / 2.0)
        all_mu.extend(mu)
        all_sig.extend(sig)
        all_w.extend(mix * mass)
    mu = np.asarray(all_mu)
    order = np.argsort(mu, kind="stable")
    return GmmModel(mu=mu[order], sig=np.asarray(all_sig)[order],
                    w=np.asarray(all_w)[order])


def _pair_crossing(mu1, sig1, w1, mu2, sig2, w2) -> float:
    """pdf crossing of two weighted Gaussians inside (mu1, mu2); midpoint
    fallback when no root lands in the interval."""
    a = 1.0 / (2.0 * sig1 ** 2) - 1.0 / (2.0 * sig2 ** 2)
    b = mu2 / sig2 ** 2 - mu1 / sig1 ** 2
    c = (mu1 ** 2 / (2.0 * sig1 ** 2) - mu2 ** 2 / (2.0 * sig2 ** 2)
         + np.log((w1 * sig2) / (w2 * sig1)))
    lo, hi = (mu1, mu2) if mu1 <= mu2 else (mu2, mu1)
    if abs(a) < 1e-300:
        if abs(b) < 1e-300:
            return 0.5 * (mu1 + mu2)
        root = -c / b
        return float(root) if lo <= root <= hi else 0.5 * (mu1 + mu2)
    disc = b * b - 4.0 * a * c
    if disc < 0:
        return 0.5 * (mu1 + mu2)
    sq = np.sqrt(disc)
    for root in ((-b - sq) / (2.0 * a), (-b + sq) / (2.0 * a)):
        if lo <= root <= hi:
            return float(root)
    return 0.5 * (mu1 + mu2)


def find_thresholds(values: np.ndarray, max_components: int = 10) -> np.ndarray:
    """Candidate thresholds from a 1-D GMM decomposition of ``values`` —
    crossings between adjacent components, ascending (the
    ``fetch_thresholds`` analog)."""
    values = np.ravel(np.asarray(values, dtype=float))
    if values.size < 2:
        return np.array([])
    mu, sig, mix = fit_gmm_1d(values, max_components=max_components)
    if mu.size < 2:
        return np.array([])
    crossings = [
        _pair_crossing(mu[i], sig[i], mix[i], mu[i + 1], sig[i + 1], mix[i + 1])
        for i in range(mu.size - 1)
    ]
    return np.sort(np.asarray(crossings))

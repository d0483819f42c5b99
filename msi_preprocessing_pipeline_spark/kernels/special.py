"""Scipy-free special functions.

The container has no scipy, so the handful of special functions the reference
relies on (``scipy.stats.norm.ppf/cdf`` in outlier detection,
``scipy.stats.pearsonr``'s p-value in baseline trend testing,
``scipy.interpolate.interp1d(kind='cubic')`` in baseline modeling) are
implemented here from published algorithms:

* normal CDF — via ``math.erfc`` (C stdlib double precision), vectorized;
* normal PPF — via ``statistics.NormalDist.inv_cdf`` (CPython's rational
  approximation), vectorized;
* regularized incomplete beta — Lentz's continued fraction (the classic
  algorithm, used for the Student-t survival function);
* not-a-knot cubic spline with polynomial-piece extrapolation — the same
  boundary conditions as scipy ``interp1d(kind='cubic')`` / MATLAB ``spline``.
"""

from __future__ import annotations

import math
from statistics import NormalDist

import numpy as np

_STD_NORMAL = NormalDist()

_erfc_vec = np.frompyfunc(math.erfc, 1, 1)
_inv_cdf_vec = np.frompyfunc(_STD_NORMAL.inv_cdf, 1, 1)
_SQRT_2 = math.sqrt(2.0)


def norm_cdf(x) -> np.ndarray:
    """Standard normal CDF, double precision."""
    x = np.asarray(x, dtype=float)
    if x.ndim == 0:
        return 0.5 * math.erfc(-float(x) / _SQRT_2)
    return (0.5 * _erfc_vec(-x / _SQRT_2)).astype(float)


def norm_ppf(p) -> np.ndarray:
    """Standard normal inverse CDF. ±inf at 0/1, nan outside [0, 1]."""
    p = np.asarray(p, dtype=float)
    out = np.full(p.shape, np.nan)
    inner = (p > 0.0) & (p < 1.0)
    if np.any(inner):
        out[inner] = _inv_cdf_vec(p[inner]).astype(float)
    out[p == 0.0] = -np.inf
    out[p == 1.0] = np.inf
    return out if out.shape else float(out)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 3e-16:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log1p(-x))
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def student_t_sf(t: float, df: float) -> float:
    """P(T > t) for Student-t with ``df`` degrees of freedom."""
    if df <= 0:
        return float("nan")
    x = df / (df + t * t)
    p_two_tail = betainc_reg(df / 2.0, 0.5, x)
    return 0.5 * p_two_tail if t >= 0 else 1.0 - 0.5 * p_two_tail


def pearsonr_p(x: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Pearson correlation and two-sided p-value (t-distribution), matching
    ``scipy.stats.pearsonr`` semantics."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    n = x.size
    if n < 3:
        return (np.nan, np.nan)
    xm = x - x.mean()
    ym = y - y.mean()
    denom = math.sqrt(float(np.dot(xm, xm)) * float(np.dot(ym, ym)))
    if denom == 0.0:
        return (np.nan, np.nan)
    r = float(np.dot(xm, ym)) / denom
    r = max(-1.0, min(1.0, r))
    if abs(r) == 1.0:
        return (r, 0.0)
    df = n - 2
    t = r * math.sqrt(df / (1.0 - r * r))
    p = 2.0 * student_t_sf(abs(t), df)
    return (r, min(p, 1.0))


class CubicSpline1D:
    """Not-a-knot cubic spline through (x, y), polynomial-piece extrapolation.

    The same interpolant family as scipy ``interp1d(kind='cubic',
    fill_value='extrapolate')`` and MATLAB ``spline``. Needs ≥ 4 points; the
    caller is expected to fall back to linear interpolation below that.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray):
        x = np.asarray(x, dtype=float)
        y = np.asarray(y, dtype=float)
        if x.size < 4:
            raise ValueError("not-a-knot cubic spline needs >= 4 points")
        order = np.argsort(x, kind="stable")
        self.x, self.y = x[order], y[order]
        h = np.diff(self.x)
        n = self.x.size
        # solve for second derivatives M with not-a-knot end conditions
        A = np.zeros((n, n))
        rhs = np.zeros(n)
        for i in range(1, n - 1):
            A[i, i - 1] = h[i - 1] / 6.0
            A[i, i] = (h[i - 1] + h[i]) / 3.0
            A[i, i + 1] = h[i] / 6.0
            rhs[i] = (self.y[i + 1] - self.y[i]) / h[i] \
                - (self.y[i] - self.y[i - 1]) / h[i - 1]
        # third-derivative continuity at the second and penultimate knots
        A[0, 0], A[0, 1], A[0, 2] = h[1], -(h[0] + h[1]), h[0]
        A[-1, -3], A[-1, -2], A[-1, -1] = h[-1], -(h[-2] + h[-1]), h[-2]
        self.m = np.linalg.solve(A, rhs)
        self.h = h

    def __call__(self, xq) -> np.ndarray:
        xq = np.asarray(xq, dtype=float)
        # clamp to end pieces → natural polynomial extrapolation
        seg = np.clip(np.searchsorted(self.x, xq, side="right") - 1,
                      0, self.x.size - 2)
        x0, x1 = self.x[seg], self.x[seg + 1]
        m0, m1 = self.m[seg], self.m[seg + 1]
        y0, y1 = self.y[seg], self.y[seg + 1]
        h = x1 - x0
        a = (x1 - xq) / h
        b = (xq - x0) / h
        return (a * y0 + b * y1
                + ((a ** 3 - a) * m0 + (b ** 3 - b) * m1) * (h ** 2) / 6.0)


def interp1d_cubic_or_linear(x: np.ndarray, y: np.ndarray):
    """Baseline-model interpolant: not-a-knot cubic when ≥ 4 anchors, linear
    otherwise (the reference would crash below 4 anchors; we degrade)."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if x.size >= 4:
        return CubicSpline1D(x, y)

    def _linear(xq):
        return np.interp(np.asarray(xq, dtype=float), x, y)

    return _linear

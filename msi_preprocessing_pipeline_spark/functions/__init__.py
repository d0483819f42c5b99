"""JVM-side column expression helpers (no Python in the hot path)."""

from .arrays import array_max_, array_min_, cosine_expr, dot_expr, l2_norm, tic  # noqa: F401

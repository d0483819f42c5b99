"""Array column expressions — whole-stage-codegen'd, usable in SQL oracles.

``tic`` is the A4 operator (row sum, reference ``pipeline/outlier.py:41-44``)
as a pure JVM expression; the pipeline's compat path instead computes the TIC
inside the UDF in float32 for bit-parity, but this is the expression any
non-compat query should use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tic(col) -> Column:
    """Total ion current: sum of the token/intensity array (double)."""
    return F.aggregate(_c(col), F.lit(0.0),
                       lambda acc, x: acc + x.cast("double"))


def dot_expr(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(col) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(_c(col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a, b) -> Column:
    return dot_expr(a, b) / (l2_norm(a) * l2_norm(b))


def array_min_(col) -> Column:
    return F.array_min(_c(col))


def array_max_(col) -> Column:
    return F.array_max(_c(col))

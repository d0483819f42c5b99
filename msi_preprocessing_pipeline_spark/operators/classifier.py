"""Linear quality classifier (fasttext-style logistic regression) for
corpus filtering — the standard "train a small classifier on
good-vs-bad documents, score everything" move (GPT-3 §A, CCNet, phi).

Bit-reproducibility discipline (the ``kmeans_fit`` pattern): every
cross-partition reduction is an EXACT integer/decimal sum —

* per-row residuals ``σ(w·x) − y`` are micro-quantized to the 1e-9 grid
  (row-local float ops are deterministic; only SUM order varies with
  partitioning, and integer sums don't care),
* per-feature gradient terms ``r_q · x_q`` are int64×int64 products
  accumulated as DECIMAL(38,0) (no float combine anywhere),
* the weight update runs driver-side in float64 on those exact sums.

So ``logreg_fit`` returns the identical weight vector for any partition
count / input order — pinnable as a golden oracle.  Scoring
(:func:`logreg_score`) is a map-only fixed-order dot product.

Scale shape: each iteration is ONE map-side-combined aggregation to a
single |features|-wide row (no shuffle beyond the final combine, no
per-row Python); ``iters`` full scans total.  At 10^12 docs you'd
persist the assembled feature relation once and pay ~8 cached scans —
still embarrassingly parallel with driver state of size |features|.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.util import quantize

DEC38 = "decimal(38,0)"
RES_SCALE = 9  # residual quantization grid (1e-9)


def _z_expr(feature_cols, weights):
    """Fixed-order float64 dot product w·x + intercept (weights[-1]).
    Row-local: deterministic under any partitioning."""
    z = F.lit(float(weights[-1]))
    for j, c in enumerate(feature_cols):
        z = z + F.col(c).cast("double") * F.lit(float(weights[j]))
    return z


def logreg_fit(df: DataFrame, feature_cols: list[str], label_col: str,
               iters: int = 8, lr: float = 1.0, l2: float = 0.0,
               scale: int = 6) -> np.ndarray:
    """Full-corpus batch gradient descent for logistic regression.
    Returns ``len(feature_cols)+1`` float64 weights (intercept last).

    Nulls in features/label are a caller bug (impute first) and raise
    in-plan under ANSI via the int cast of the label; feature nulls are
    fail-fasted here explicitly.  ``l2`` applies to non-intercept
    weights.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    nullcheck = None
    for c in list(feature_cols) + [label_col]:
        cond = F.col(c).isNull()
        nullcheck = cond if nullcheck is None else (nullcheck | cond)
    base = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("int").alias("__y"),
        nullcheck.alias("__anynull"))
    xq = {f"__xq{j}": quantize(F.col(c), scale)
          for j, c in enumerate(feature_cols)}
    # materialize the narrow training relation ONCE: each GD round is a
    # single scalar aggregation over it, instead of re-executing the
    # caller's feature subtree (raw scan + string ops) once per round
    # (+ once for the null probe, evaluated on the same pass here)
    base = base.withColumns(xq).localCheckpoint()
    if base.where("__anynull").limit(1).count() > 0:
        raise ValueError("logreg_fit requires non-null features/label "
                         "(impute first)")

    w = np.zeros(len(feature_cols) + 1, dtype=np.float64)
    n = None
    for _ in range(iters):
        z = _z_expr(feature_cols, w)
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        rq = quantize(sig - F.col("__y").cast("double"), RES_SCALE)
        aggs = [F.sum((rq * F.col(f"__xq{j}")).cast(DEC38))
                .alias(f"g{j}") for j in range(len(feature_cols))]
        aggs.append(F.sum(rq.cast(DEC38)).alias("g_b"))
        aggs.append(F.count("*").alias("n"))
        row = base.agg(*aggs).collect()[0]
        n = int(row["n"])
        if n == 0:
            raise ValueError("empty training input")
        denom = float(n) * (10.0 ** RES_SCALE)
        g = np.empty_like(w)
        for j in range(len(feature_cols)):
            # exact decimal sum -> int -> float64 once
            g[j] = float(int(row[f"g{j}"])) / (denom * 10.0 ** scale)
        g[-1] = float(int(row["g_b"])) / denom
        if l2:
            g[:-1] = g[:-1] + l2 * w[:-1]
        w = w - lr * g
    return w


def logreg_score(df: DataFrame, weights, feature_cols: list[str],
                 out_col: str = "z") -> DataFrame:
    """Map-only scoring: ``z = w·x`` (fixed-order float64) plus the
    threshold decision ``pred = z > 0`` (≡ σ(z) > 0.5 — no exp needed,
    so the decision is exact integer-free-of-float-boundary only when z
    is; quantize z for contracts).  Null features yield null z and null
    pred (score after imputing)."""
    w = np.asarray(weights, dtype=np.float64)
    if len(w) != len(feature_cols) + 1:
        raise ValueError("weights must be len(features)+1 (intercept)")
    z = _z_expr(feature_cols, w)
    return df.withColumns({
        out_col: z,
        "pred": (z > 0).cast("int"),
    })

"""Distributed EXACT quantiles.

The compat path requires numpy-identical quantiles (MATLAB-alike plotting
positions, linear interpolation — SURVEY.md §2 A7/A9); ``percentile_approx``
is not acceptable there. The scalable exact algorithm: global sort (range
shuffle), global ranks via per-partition offsets, then fetch only the 2·|q|
boundary rows and interpolate on the driver.

Cost: one shuffle of the single projected column + one count per call —
O(n log n) network-free per partition, no driver materialization beyond the
handful of boundary rows. This survives 10^12 rows (the sort is Spark's
bread and butter); the alternative (collect to numpy) does not.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..kernels.stats import interp_quantile_from_sorted, matlab_positions


COLLECT_THRESHOLD = 10_000_000  # scalars; ~80 MB on the driver


def exact_quantiles(df: DataFrame, col: str, qs,
                    collect_threshold: int = COLLECT_THRESHOLD) -> np.ndarray:
    """numpy ``percentile(..., method='linear')``-identical quantiles of a
    column. ``qs`` in [0, 1].

    Scale-adaptive physical plan: below ``collect_threshold`` non-null values
    the single projected column is collected and numpy computes the
    percentile directly (one job); above it, the distributed global-sort +
    rank-fetch path runs (arithmetically identical — both use the same
    linear-interpolation formula)."""
    qs = np.atleast_1d(np.asarray(qs, dtype=float))
    values = df.select(col).where(f"{col} is not null")
    n = values.count()
    if n == 0:
        return np.full(qs.shape, np.nan)
    if n <= collect_threshold:
        # Arrow-batched transfer: row-based collect() deserializes one Row
        # object per value (~10× wall on 10^6 scalars)
        vals = values.toPandas()[values.columns[0]].to_numpy(dtype=float)
        return np.percentile(vals, 100.0 * qs)
    ordered = values.sort(col).rdd.map(lambda r: r[0])
    with_rank = ordered.zipWithIndex()  # global rank after range-partitioned sort
    with_rank = with_rank.cache()
    try:
        wanted: set[int] = set()
        plans = []
        for q in qs:
            lo, hi, frac = interp_quantile_from_sorted(n, float(q))
            plans.append((lo, hi, frac))
            wanted.add(lo)
            wanted.add(hi)
        fetched = dict(
            (rank, float(v))
            for v, rank in with_rank.filter(lambda vr: vr[1] in wanted).collect()
        )
        out = np.array([
            fetched[lo] + frac * (fetched[hi] - fetched[lo])
            for lo, hi, frac in plans
        ])
        return out
    finally:
        with_rank.unpersist()


def matlab_quantiles(df: DataFrame, col: str, qs) -> np.ndarray:
    """Distributed MATLAB-alike quantiles (kernel ``stats.mquantile``
    semantics): remap q onto the clipped plotting positions first."""
    n = df.where(f"{col} is not null").count()
    remapped = matlab_positions(n, np.atleast_1d(np.asarray(qs, dtype=float)))
    return exact_quantiles(df, col, remapped)

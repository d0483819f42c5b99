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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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
    # Catalyst-native global ranks (no RDD scan, AQE stays on): range-sort,
    # then rank = per-partition offset + row_number within the sorted
    # partition. The offsets job is a map-side-combined count per partition
    # id (tiny); the window's hash exchange on the partition id moves each
    # range-partition as one balanced group.
    sorted_vals = (values.sort(col)
                   .select(F.col(col).alias("__v"),
                           F.spark_partition_id().alias("__pid"))
                   .persist())
    try:
        wanted: set[int] = set()
        plans = []
        for q in qs:
            lo, hi, frac = interp_quantile_from_sorted(n, float(q))
            plans.append((lo, hi, frac))
            wanted.add(lo)
            wanted.add(hi)
        counts = sorted_vals.groupBy("__pid").count().collect()
        offsets = {}
        acc = 0
        for row in sorted(counts, key=lambda r: r["__pid"]):
            offsets[row["__pid"]] = acc
            acc += row["count"]
        spark = df.sparkSession
        off_df = F.broadcast(spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()],
            schema="__pid int, __off long"))
        w = Window.partitionBy("__pid").orderBy("__v")
        ranked = (sorted_vals.join(off_df, "__pid")
                  .withColumn("__gr",
                              F.col("__off") + F.row_number().over(w) - 1))
        fetched = {
            int(r["__gr"]): float(r["__v"])
            for r in ranked.where(
                F.col("__gr").isin(*[int(x) for x in wanted])).collect()
        }
        return np.array([
            fetched[lo] + frac * (fetched[hi] - fetched[lo])
            for lo, hi, frac in plans
        ])
    finally:
        sorted_vals.unpersist()


def matlab_quantiles(df: DataFrame, col: str, qs) -> np.ndarray:
    """Distributed MATLAB-alike quantiles (kernel ``stats.mquantile``
    semantics): remap q onto the clipped plotting positions first."""
    n = df.where(f"{col} is not null").count()
    remapped = matlab_positions(n, np.atleast_1d(np.asarray(qs, dtype=float)))
    return exact_quantiles(df, col, remapped)

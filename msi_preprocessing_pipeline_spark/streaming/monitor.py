"""Online feature-drift monitoring: per-window PSI against a static
reference histogram.

Structured Streaming allows ONE aggregation per query, so the monitor is
split the standard way: the streaming query produces watermarked
per-(event-time-window, bin) counts — bounded state, append mode — and a
``foreachBatch`` landing step joins each completed window against the
(broadcast, driver-computed) reference shares and reduces the bins to one
PSI row per window. The reference histogram is TRAINING-time data, so
computing it once up front (batch) is exactly the deployment shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.drift import _bin_counts, bin_expr


def reference_shares(ref: DataFrame, col: str, lo: float, hi: float,
                     n_bins: int = 10,
                     smoothing: float = 0.5) -> list[tuple[int, float]]:
    """Laplace-smoothed reference bin shares ``[(bin, p)]`` — bounded
    (n_bins entries), computed once at monitor start and closed over by
    the landing step. Same binning/smoothing as
    :func:`..operators.drift.psi_drift`."""
    counts = {r["bin"]: r["n"] for r in
              _bin_counts(ref, col, lo, hi, n_bins, "n").collect()}
    total = float(sum(counts.values())) + smoothing * n_bins
    return [(b, (counts.get(b, 0) + smoothing) / total)
            for b in range(n_bins)]


def streaming_bin_counts(events: DataFrame, col: str, lo: float, hi: float,
                         n_bins: int = 10, ts_col: str = "ts",
                         window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """The streaming half: watermarked per-(tumbling-window, bin) counts.
    One aggregation, append-mode-compatible, state bounded by
    (windows-in-watermark × n_bins)."""
    x = F.col(col).cast("double")
    bin_ = bin_expr(col, lo, hi, n_bins)  # SHARED with batch psi_drift
    return (events
            # watermarks require TIMESTAMP (with zone); parquet NTZ columns
            # cast deterministically under the session's pinned UTC zone
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .where(x.isNotNull())
            .groupBy(F.window(F.col(ts_col), window).alias("win"),
                     bin_.alias("bin"))
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"), "bin", "n"))


def psi_of_batch(batch: DataFrame, ref_shares: list[tuple[int, float]],
                 n_bins: int = 10, smoothing: float = 0.5) -> DataFrame:
    """The landing half (call inside ``foreachBatch``): reduce a
    bin-counts micro-batch to one PSI row per window. Missing bins get the
    smoothed zero share, mirroring :func:`..operators.drift.psi_drift`."""
    spark = batch.sparkSession
    ref = spark.createDataFrame(ref_shares, "bin int, p double")
    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    # rename the right side before re-joining a projection of the same
    # relation (self-join column-reference conflict otherwise)
    counts = batch.select(F.col("window_start").alias("__ws"),
                          F.col("window_end").alias("__we"),
                          F.col("bin").alias("__bin"), "n")
    wins = batch.select("window_start", "window_end").distinct()
    full = (wins.crossJoin(spine)
            .join(counts, (F.col("window_start") == F.col("__ws"))
                  & (F.col("window_end") == F.col("__we"))
                  & (F.col("bin") == F.col("__bin")), "left")
            .select("window_start", "window_end", "bin",
                    F.coalesce("n", F.lit(0)).alias("n"))
            .join(F.broadcast(ref), "bin"))
    s = F.lit(float(smoothing))
    from pyspark.sql import Window as W
    w = W.partitionBy("window_start", "window_end")
    q = (F.col("n").cast("double") + s) / \
        (F.sum("n").over(w).cast("double") + s * F.lit(float(n_bins)))
    contrib = (F.col("p") - q) * F.log(F.col("p") / q)
    return (full.select("window_start", "window_end",
                        contrib.alias("c"), F.col("n"))
            .groupBy("window_start", "window_end")
            .agg(F.sum("c").alias("psi"), F.sum("n").alias("n_events")))

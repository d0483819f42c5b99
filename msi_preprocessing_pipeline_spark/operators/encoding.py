"""Feature encoding and scaling primitives.

The last mile of a feature pipeline: turn raw columns into model-ready
numerics. Everything here is pure JVM expressions (shuffle-free where
possible) and engine-portable — the hashing uses the same md5 idiom as
``operators.sampling`` so every output is SQL-oracle-able bit-for-bit.
See also :func:`..training.target_encode_pit` for the leakage-sensitive
target encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.util import as_list as _as_list


def _join_group_stats(df: DataFrame, stats: DataFrame, groups) -> DataFrame:
    """Left join per-group stats back onto the rows, NULL-SAFELY: groupBy
    emits a stats row for the NULL group, and a plain equi-join would drop
    every null-keyed input row (null != null). The <=> condition still
    hash-joins; stats' key copies are dropped after."""
    renamed = stats
    for g in groups:
        renamed = renamed.withColumnRenamed(g, f"__gs_{g}")
    cond = None
    for g in groups:
        c = F.col(g).eqNullSafe(F.col(f"__gs_{g}"))
        cond = c if cond is None else (cond & c)
    return (df.join(renamed, cond, "left")
            .drop(*[f"__gs_{g}" for g in groups]))


def feature_hash(df: DataFrame, cols, n_buckets: int = 1024,
                 seed: int = 0, out_col: str = "feature_bucket") -> DataFrame:
    """Hashing-trick bucket id over one or more columns (Weinberger et al.
    2009): ``md5(col₁:col₂:…:seed)`` → first 8 hex chars → int → mod
    ``n_buckets``. Deterministic, partition-invariant, engine-portable
    (the same integer in Spark, DuckDB and Python), and shuffle-free —
    a map-only expression on 10^12 rows.

    Null columns hash as absent (``concat_ws`` skips nulls in both
    engines), so (NULL, 'a') and ('a', NULL) collide — acceptable for the
    hashing trick; pre-coalesce sentinel values if that matters.
    """
    from ..functions.util import md5_bucket

    key = F.concat_ws(
        ":", *[F.col(c).cast("string") for c in _as_list(cols)],
        F.lit(str(seed)))
    return df.withColumn(out_col, md5_bucket(key, n_buckets).cast("int"))


def standardize_robust(df: DataFrame, col: str, group_cols=None,
                       out_col: str | None = None) -> DataFrame:
    """Outlier-robust standardization: ``(x - median) / IQR``, optionally
    per group — the scaling that heavy-tailed feature distributions need
    (a plain z-score lets one outlier set the scale).

    Median and quartiles are EXACT (Spark's ``percentile`` aggregate,
    linear interpolation — the same definition as DuckDB
    ``quantile_cont`` and ``numpy.percentile(method='linear')``).
    Zero-IQR groups (constant feature) yield NULL rather than ±inf.

    Scale shape: one partial+final aggregation to a GROUP-cardinality
    relation, then one equi-join back on the group key (AQE broadcasts it
    when small — no forced hint, the group count is data-dependent); the
    ungrouped form attaches a broadcast 1-row aggregate (lazy). The
    quantile aggregation collects each group's values into sorted memory
    on one reducer — for groups above ~10^8 rows compute the stats with
    ``operators.quantiles.grouped_exact_quantiles`` (range-partitioned,
    no single-reducer materialization) and join them back instead.
    """
    groups = _as_list(group_cols or [])
    x = F.col(col).cast("double")
    med = F.expr(f"percentile({col}, 0.5)").alias("__rs_med")
    iqr = (F.expr(f"percentile({col}, 0.75)")
           - F.expr(f"percentile({col}, 0.25)")).alias("__rs_iqr")
    if groups:
        joined = _join_group_stats(df, df.groupBy(*groups).agg(med, iqr),
                                   groups)
    else:
        joined = df.crossJoin(F.broadcast(df.agg(med, iqr)))
    z = F.when(F.col("__rs_iqr") > F.lit(0.0),
               (x - F.col("__rs_med")) / F.col("__rs_iqr"))
    return (joined.withColumn(out_col or f"{col}_robust", z)
            .drop("__rs_med", "__rs_iqr"))


def quantile_bin(df: DataFrame, col: str, n_bins: int = 10,
                 group_cols=None, out_col: str | None = None) -> DataFrame:
    """Equal-frequency discretization: bin index = how many of the
    column's exact quantile edges (q = 1/n … (n-1)/n, linear
    interpolation) the value is >= — i.e. ``searchsorted(edges, x,
    'right')``. Values land in 0 … n_bins-1; NULLs stay NULL.

    Edge-based (not ``ntile``): rank-based binning splits ties
    arbitrarily across buckets, so equal values can get different bins
    depending on partitioning — edges are a deterministic function of the
    data and equal inputs always share a bin (buckets are then only
    approximately equal-count under heavy ties, which is the standard
    trade).

    Scale shape: ONE aggregation computes all edges as an array
    (``percentile(col, array(...))``), joined back (broadcast 1-row for
    the global form; group-cardinality equi-join, AQE-sized, for the
    grouped form); the bin index is a JVM ``aggregate`` over the bounded
    edge array — map-only after the join. Same single-reducer caveat per
    group as :func:`standardize_robust`.
    """
    groups = _as_list(group_cols or [])
    qs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    edges = F.expr(f"percentile({col}, array({qs}))").alias("__qb_edges")
    if groups:
        joined = _join_group_stats(df, df.groupBy(*groups).agg(edges),
                                   groups)
    else:
        joined = df.crossJoin(F.broadcast(df.agg(edges)))
    x = F.col(col).cast("double")
    bin_ = F.when(x.isNotNull(), F.aggregate(
        "__qb_edges", F.lit(0),
        lambda acc, e: acc + F.when(x >= e, 1).otherwise(0)).cast("int"))
    return (joined.withColumn(out_col or f"{col}_bin", bin_)
            .drop("__qb_edges"))


def winsorize(df: DataFrame, col: str, lo_q: float = 0.01,
              hi_q: float = 0.99, group_cols=None,
              out_col: str | None = None) -> DataFrame:
    """Percentile clipping: values below the exact ``lo_q`` quantile (or
    above ``hi_q``) are pulled to that quantile, optionally per group —
    the tail-taming step before scale-sensitive featurization (a z-score
    or mean that one sensor glitch would otherwise own).

    Quantiles are EXACT with linear interpolation (``percentile``, the
    same definition as DuckDB ``quantile_cont`` — the
    :func:`standardize_robust` discipline); NULLs stay NULL; the output
    is double.  ``lo_q <= hi_q`` is validated; single-row groups clip to
    their own value (both edges coincide) — a no-op, as it should be.

    Scale shape: identical to :func:`standardize_robust` — one
    aggregation to a group-cardinality relation (broadcast 1-row for
    the global form), one null-safe equi-join back, then a map-only
    ``least/greatest``.  Same per-group single-reducer caveat; swap in
    ``quantiles.grouped_exact_quantiles`` for 10^8+-row groups.
    """
    if not 0.0 <= lo_q <= hi_q <= 1.0:
        raise ValueError(
            f"need 0 <= lo_q <= hi_q <= 1, got {lo_q}, {hi_q}")
    groups = _as_list(group_cols or [])
    lo = F.expr(f"percentile({col}, {lo_q!r})").alias("__wz_lo")
    hi = F.expr(f"percentile({col}, {hi_q!r})").alias("__wz_hi")
    if groups:
        joined = _join_group_stats(df, df.groupBy(*groups).agg(lo, hi),
                                   groups)
    else:
        joined = df.crossJoin(F.broadcast(df.agg(lo, hi)))
    x = F.col(col).cast("double")
    clipped = F.when(x.isNotNull(),
                     F.least(F.greatest(x, F.col("__wz_lo")),
                             F.col("__wz_hi")))
    return (joined.withColumn(out_col or f"{col}_winsor", clipped)
            .drop("__wz_lo", "__wz_hi"))

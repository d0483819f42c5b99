"""Feature encoding and scaling primitives.

The last mile of a feature pipeline: turn raw columns into model-ready
numerics. Everything here is pure JVM expressions (shuffle-free where
possible) and engine-portable — the hashing uses the same md5 idiom as
``operators.sampling`` so every output is SQL-oracle-able bit-for-bit.
See also :func:`..training.target_encode_pit` for the leakage-sensitive
target encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def lump_rare(df: DataFrame, col: str, min_count: int = 0,
              min_frac: float = 0.0,
              other: str = "__other__") -> DataFrame:
    """Rare-category lumping: adds ``{col}_lumped`` replacing every
    category whose corpus count is below ``min_count`` OR below
    ``min_frac`` of the non-null total with the ``other`` sentinel —
    the standard cardinality-taming step before one-hot / target
    encoding (a 10^7-value tail becomes one bucket instead of 10^7
    near-empty features).  NULL stays NULL (absence is its own
    signal, never lumped into ``other``).

    Scale notes: one map-side-combined count over |categories| plus a
    1-row total, joined back on the category (AQE broadcasts the
    vocabulary-sized side); rows themselves never shuffle.  The
    ``min_frac`` comparison is ``count >= min_frac * total`` in
    doubles — exact-int inputs, one IEEE multiply, engine-portable.
    """
    if min_count < 0 or not (0.0 <= min_frac <= 1.0):
        raise ValueError(
            f"need min_count >= 0 and 0 <= min_frac <= 1, "
            f"got {min_count}, {min_frac}")
    counts = (df.where(F.col(col).isNotNull())
              .groupBy(F.col(col).alias("__cat"))
              .agg(F.count("*").alias("__cn")))
    total = counts.agg(F.sum("__cn").alias("__tot"))
    keep = (counts.crossJoin(total)
            .where((F.col("__cn") >= F.lit(min_count))
                   & (F.col("__cn").cast("double")
                      >= F.lit(float(min_frac))
                      * F.col("__tot").cast("double")))
            .select("__cat"))
    kept = keep.select(F.col("__cat"), F.lit(True).alias("__keep"))
    # left join: unmatched non-null categories -> other; null passes
    return (df.join(kept, F.col(col) == kept["__cat"], "left")
            .drop("__cat")
            .withColumn(f"{col}_lumped",
                        F.when(F.col(col).isNull(), F.lit(None))
                        .when(F.col("__keep"), F.col(col))
                        .otherwise(F.lit(other)))
            .drop("__keep"))


def value_histogram(df: DataFrame, col: str, group_cols,
                    lo: float, hi: float, n_bins: int) -> DataFrame:
    """Per-entity fixed-range histogram of ``col`` as a feature vector:
    ``(entity…, n_values, hist array<bigint>)`` with ``n_bins`` equal
    bins over ``[lo, hi)``; out-of-range values are CLAMPED into the
    edge bins (tail mass stays visible), nulls dropped; entities with
    no non-null values emit nothing.

    Scale notes: the bin index is one JVM expression, the histogram is
    ONE map-side-combined aggregation (``n_bins`` conditional sums
    assembled into an array — no explode, no pivot, no second
    shuffle).  Keep ``n_bins`` in the hundreds at most: it is a
    column-count, not a row-count, bound.  Bin edges are
    ``lo + i·(hi−lo)/n_bins`` in doubles (IEEE-identical across
    engines); counts are exact ints.
    """
    if not (hi > lo) or n_bins < 1:
        raise ValueError(
            f"need hi > lo and n_bins >= 1, got [{lo}, {hi}), {n_bins}")
    if n_bins > 10_000:
        raise ValueError(f"n_bins={n_bins} is a column-count bound; "
                         "use quantile_bin for fine-grained binning")
    parts = _as_list(group_cols)
    width = (hi - lo) / n_bins
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
    obs = (df.where(F.col(col).isNotNull())
           .select(*parts, bin_.alias("__b")))
    return (obs.groupBy(*parts)
            .agg(F.count("*").alias("n_values"),
                 F.array(*[
                     F.coalesce(F.sum(F.when(F.col("__b") == i, 1)),
                                F.lit(0)).cast("long")
                     for i in range(n_bins)]).alias("hist")))


def impute_median(df: DataFrame, col: str, group_cols=None,
                  out_col: str | None = None) -> DataFrame:
    """Missing-value imputation with the (group) median: adds
    ``{col}_imputed`` = the value itself when present, else the
    group's exact median (Spark ``percentile``, linear interpolation —
    the same definition as DuckDB ``quantile_cont`` / numpy
    ``method='linear'``, so results are engine-reproducible).  Groups
    whose values are ALL null keep null (no global fallback — run a
    second ungrouped pass if you want one; silent cross-group leakage
    is worse than an honest null).  Median over mean is deliberate:
    the imputed value is (a midpoint of) observed data, robust to the
    tails, and free of summation-order float wobble.

    Scale shape: one partial+final aggregation to a group-cardinality
    relation, null-safely joined back (AQE broadcasts small group
    sets); same single-reducer-per-group percentile caveat as
    :func:`standardize_robust` — use
    ``operators.quantiles.grouped_exact_quantiles`` above ~10^8 rows
    per group.
    """
    groups = _as_list(group_cols or [])
    med = F.expr(f"percentile({col}, 0.5)").alias("__im_med")
    if groups:
        joined = _join_group_stats(df, df.groupBy(*groups).agg(med),
                                   groups)
    else:
        joined = df.crossJoin(F.broadcast(df.agg(med)))
    return (joined.withColumn(
        out_col or f"{col}_imputed",
        F.coalesce(F.col(col).cast("double"), F.col("__im_med")))
        .drop("__im_med"))


def ecdf_transform(df: DataFrame, col: str, group_cols=None,
                   out_col: str | None = None) -> DataFrame:
    """Empirical-CDF (rank) normalization: adds ``{col}_ecdf`` =
    fraction of the (group's) NON-NULL values ``<= x`` — ties share a
    value (peers count together), outputs lie in ``(0, 1]``, and the
    transform is invariant to any monotone rescaling of the input —
    the standard first step of rank-gauss style normalization and the
    scale-free alternative to z-scores.  NULL inputs get NULL.

    Exactness: the ECDF is one division of two exact int64 counts
    (rows-≤-x over non-null-total) — engine-portable bit-for-bit,
    no percentile interpolation anywhere.

    Scale notes: one hash shuffle on the group key serving two window
    specs (an ordered RANGE frame for the ≤-count, an unordered total
    count); no joins, no second exchange.  NULLs sort first and a
    RANGE frame over only-null prefixes counts zero non-nulls, which
    the null-in guard masks — ordering conventions never leak into
    the result.  Ungrouped use shuffles everything to one partition
    (it is a global sort) — prefer grouped use at corpus scale, or
    ``quantile_bin`` for a fixed-resolution global variant.
    """
    groups = _as_list(group_cols or [])
    w_tot = Window.partitionBy(*groups)
    w_le = (Window.partitionBy(*groups)
            .orderBy(F.col(col).asc_nulls_first())
            .rangeBetween(Window.unboundedPreceding, 0))
    ecdf = F.when(
        F.col(col).isNotNull(),
        F.count(col).over(w_le).cast("double")
        / F.count(col).over(w_tot).cast("double"))
    return df.withColumn(out_col or f"{col}_ecdf", ecdf)


def rank_gauss(df: DataFrame, col: str, id_col: str,
               out_col: str | None = None,
               clip: float = 0.999999) -> DataFrame:
    """Rank-Gauss (Gauss-rank) normalization — the tabular-NN feature
    transform (popularized by Michael Jahrer's Porto Seguro winner):
    map each value to ``Φ⁻¹((rank + 0.5) / n)`` so the column becomes
    exactly standard-normal-distributed regardless of its original
    shape, robust to outliers (only ranks matter).

    Determinism: ranks come from :func:`layout.global_rank` under the
    TOTAL order ``(value, id)`` — partition/engine-invariant (average
    tie ranks would need a second window; the id tiebreak is the
    documented convention, same as the argsort every reference
    implementation uses).  Φ⁻¹ is the repo's scipy-free
    ``kernels.special.norm_ppf`` (Acklam rational approximation +
    one Halley step — deterministic numpy, golden-pinnable), applied
    in ONE Arrow pass.  ``clip`` bounds the uniform away from 0/1 so
    extreme ranks stay finite.  Null values pass through as null
    (excluded from n and ranking).

    Scale shape: the `global_rank` range-sort machinery (one range
    exchange, |partitions| offsets collect, per-partition window) +
    one map-only Arrow pass; nothing corpus-sized ever single-partitions.
    """
    from typing import Iterator

    import pandas as pd

    from ..kernels.special import norm_ppf
    from .layout import global_rank

    out_col = out_col or f"{col}_rg"
    nn = df.where(F.col(col).isNotNull())
    ranked = global_rank(
        nn, [F.col(col).asc(), F.col(id_col).asc()], out_col="__gr")
    n = ranked.count()  # the checkpointed relation: cheap rescan
    lo, hi = 1.0 - clip, clip

    def gauss(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            u = (pdf["__gr"].to_numpy(dtype=np.float64) + 0.5) / n
            u = np.clip(u, lo, hi)
            pdf = pdf.drop(columns=["__gr"])
            pdf[out_col] = norm_ppf(u)
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in ranked.schema
        if f.name != "__gr") + f", {out_col} double"
    transformed = ranked.mapInPandas(gauss, schema=schema)
    nulls = df.where(F.col(col).isNull()) \
        .withColumn(out_col, F.lit(None).cast("double"))
    return transformed.unionByName(nulls)


def quantile_normalize(df: DataFrame, source_col: str, value_col: str,
                       id_col: str, scale: int = 6) -> DataFrame:
    """Cross-source quantile normalization: each row's value is replaced
    by the POOLED distribution's order statistic at the row's
    source-relative rank — after it, every source has (as nearly as
    integer ranks allow) the same marginal distribution.  The standard
    harmonization when sources disagree in scale/shape for reasons that
    are batch artifacts, not signal (Bolstad 2003's microarray method in
    its rank-map form) — for training data: make per-source quality
    scores comparable before a global threshold.

    Exact contract: within each source, rank ``r`` by ``(q, id)``
    (quantized value, id tiebreak — total order); the pooled target rank
    is ``R = ceil(r·N / n_s) = (r·N + n_s − 1) div n_s`` (exact int64);
    the mapped value is the pooled order statistic at rank R — resolved
    against the |distinct value|-bounded cumulative census where each
    distinct value owns the rank interval ``(cum − c, cum]``.  These
    intervals partition 1..N, so the range join matches each row exactly
    once; everything is integer comparisons — engine/partition
    bit-identical.

    Returns ``(id, source, q_u, qn_u)`` — original and normalized values
    in quantized units.  Null source/value rows are dropped.

    Plan shape: one per-source ordered window (rank) + one broadcast
    range join against the census axis.  NOTE the per-source window
    serializes each source onto one task — with few giant sources at
    10^12 rows, compute ranks with the ``quantiles.grouped`` range-
    partition machinery instead (same contract, documented trade).
    """
    from ..functions.util import quantize

    base = (df.where(F.col(source_col).isNotNull()
                     & F.col(value_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.col(source_col).alias("source"),
                    quantize(F.col(value_col), scale).alias("q_u")))
    w = Window.partitionBy("source").orderBy("q_u", "id")
    ws = Window.partitionBy("source")
    ranked = base.select(
        "id", "source", "q_u",
        F.row_number().over(w).alias("__r"),
        F.count("*").over(ws).alias("__ns"))
    n_total = base.groupBy("q_u").agg(F.count("*").alias("__c"))
    wax = Window.orderBy("q_u").rowsBetween(
        Window.unboundedPreceding, 0)
    axis = n_total.select(
        F.col("q_u").alias("qn_u"),
        (F.sum("__c").over(wax) - F.col("__c")).alias("__lo"),
        F.sum("__c").over(wax).alias("__hi"))
    one = base.agg(F.count("*").alias("__n"))
    # exact decimal(38,0) arithmetic throughout: r·N overflows int64
    # past ~3e9 rows, and a bigint `/` is DOUBLE division (silent
    # off-by-one once r·N exceeds 2^53) — the repo-wide trunc_div
    # discipline, mirroring the oracle's integer `//`
    from ..functions.util import DEC38, trunc_div
    rn = (F.col("__r").cast(DEC38) * F.col("__n")
          + F.col("__ns") - 1)
    tgt = ranked.crossJoin(F.broadcast(one)).select(
        "id", "source", "q_u",
        (rn - rn % F.col("__ns")).alias("__rnum"),
        F.col("__ns"))
    tgt = tgt.select(
        "id", "source", "q_u",
        trunc_div(F.col("__rnum"),
                  F.col("__ns").cast(DEC38)).cast("long").alias("__R"))
    out = tgt.join(
        F.broadcast(axis),
        (F.col("__R") > F.col("__lo")) & (F.col("__R") <= F.col("__hi")))
    return out.select("id", "source", "q_u", "qn_u")

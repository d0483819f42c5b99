"""Data-distribution diagnostics: key skew profile, heavy keys,
event-time disorder.

Planning inputs for the engine's own scale knobs: whether a join key
needs salting, what ``spark.sql.shuffle.partitions`` a groupBy needs,
and what watermark a streaming job can afford all derive from (a) the
key-count distribution and (b) how out-of-order event time is relative
to arrival order.  These operators compute those exactly, at corpus
scale, with no driver materialization.

* :func:`key_counts` / :func:`key_profile` — per-key row counts and a
  one-row skew summary (count quantiles via the giant-group-safe
  rank-fetch machinery, max/avg share of the hottest key).
* :func:`heavy_keys` — exact top-k hottest keys with a deterministic
  total tie-break (count desc, key asc) — a ``TakeOrderedAndProject``,
  never a global sort.
* :func:`disorder_stats` — exact lateness distribution of an event
  stream relative to its arrival sequence WITHOUT a single-partition
  global window: arrival is bucketized, the running maximum factorizes
  into an in-bucket prefix (per-bucket window) plus a carry-in from
  all earlier buckets (a window over the tiny |buckets| relation),
  and the two compose to the exact global prefix max — the same
  bucket+carry decomposition as ``encoding._expanding_prior_sums``.

Scale notes: ``key_counts`` is one map-side-combined aggregation;
``key_profile`` adds only |keys|-relation reductions (its quantiles
range-partition the COUNTS, so a 10^9-key table still spreads);
``disorder_stats`` shuffles the corpus once on the bucket key —
``bucket_width`` controls the |buckets| relation (keep n/width under
~10^6 so the carry window's single partition stays trivial).

Reference parity: the reference profiles per-spectrum TIC sums to pick
outlier thresholds before modeling (``components/matlab_alike.py``
Gamma-mixture threshold over summary stats); these are the same
"summarize the distribution before committing to a plan" shape over
key counts and event-time skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.util import as_list
from .quantiles import grouped_exact_quantiles


def key_counts(df: DataFrame, key_cols) -> DataFrame:
    """``(key_cols…, n)`` — exact per-key row counts.  NULL key values
    group as real values (a null-keyed hot spot is still a hot spot)."""
    keys = as_list(key_cols)
    return df.groupBy(*keys).agg(F.count("*").alias("n"))


def key_profile(df: DataFrame, key_cols,
                qs: Sequence[float] = (0.5, 0.9, 0.99)) -> DataFrame:
    """One-row key-skew summary: ``(n_rows, n_keys, max_n, min_n,
    avg_n, top_share, p{q}_n…)``.

    ``avg_n`` and ``top_share`` are single divisions of exact int64
    counts; the count quantiles come from
    :func:`~.quantiles.grouped_exact_quantiles` (range-partitioned —
    no single-reducer sort even at 10^9 keys).
    """
    counts = key_counts(df, key_cols)
    stats = counts.agg(
        F.sum("n").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_n"),
        F.min("n").alias("min_n"))
    quant = grouped_exact_quantiles(counts, "n", [], list(qs))
    pivoted = quant.agg(*[
        F.max(F.when(F.col("q") == float(q), F.col("value")))
        .alias(f"p{round(float(q) * 100):02d}_n") for q in qs])
    return (stats.crossJoin(pivoted)
            .select("n_rows", "n_keys", "max_n", "min_n",
                    (F.col("n_rows").cast("double") / F.col("n_keys"))
                    .alias("avg_n"),
                    (F.col("max_n").cast("double") / F.col("n_rows"))
                    .alias("top_share"),
                    *[f"p{round(float(q) * 100):02d}_n" for q in qs]))


def heavy_keys(df: DataFrame, key_cols, k: int = 20) -> DataFrame:
    """Exact top-``k`` hottest keys ``(key_cols…, n)``, deterministic
    under ties (count desc, then key columns asc)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keys = as_list(key_cols)
    return (key_counts(df, keys)
            .orderBy(F.col("n").desc(),
                     *[F.col(c).asc_nulls_last() for c in keys])
            .limit(k))


def disorder_stats(df: DataFrame, seq_col: str, num_ts_col: str,
                   bucket_width: int = 100_000) -> DataFrame:
    """One-row out-of-orderness summary of a stream whose arrival order
    is ``seq_col`` (unique integers) and whose event time is the
    NUMERIC column ``num_ts_col`` (e.g. epoch millis): ``(n_events,
    n_late, frac_late, max_lateness, p50_lateness, p99_lateness)``.

    A row's lateness is ``max(0, max(ts of strictly-earlier seq) - ts)``
    — exactly what a streaming watermark must absorb.  Lateness
    quantiles are over LATE rows only (null when nothing is late).
    Rows with null seq/ts are ignored; ``seq_col`` values must be
    unique (ties would make "earlier" ambiguous).

    The global running max is NEVER computed as a single-partition
    window: arrival buckets of ``bucket_width`` get an in-bucket
    prefix max (per-bucket window) plus a carry-in maximum over all
    earlier buckets (window over the |buckets| relation), which
    compose exactly.
    """
    if bucket_width < 1:
        raise ValueError(
            f"bucket_width must be >= 1, got {bucket_width}")
    ev = (df.where(F.col(seq_col).isNotNull()
                   & F.col(num_ts_col).isNotNull())
          .select(F.col(seq_col).alias("__seq"),
                  F.col(num_ts_col).cast("long").alias("__ts"),
                  F.floor(F.col(seq_col) / bucket_width).alias("__b")))
    w_in = (Window.partitionBy("__b").orderBy("__seq")
            .rowsBetween(Window.unboundedPreceding, -1))
    w_carry = (Window.orderBy("__b")
               .rowsBetween(Window.unboundedPreceding, -1))
    bmax = (ev.groupBy("__b").agg(F.max("__ts").alias("__bm"))
            .select("__b", F.max("__bm").over(w_carry).alias("__carry")))
    # greatest() skips nulls (first bucket has no carry, first row of a
    # bucket has no in-bucket prefix); null only when BOTH are missing.
    swept = (ev.join(bmax, ["__b"])
             .select("__ts",
                     F.greatest(F.max("__ts").over(w_in),
                                F.col("__carry")).alias("__pm")))
    late = F.greatest(F.col("__pm") - F.col("__ts"), F.lit(0))
    lateness = swept.select(
        F.when(F.col("__pm").isNotNull(), late).otherwise(F.lit(0))
        .alias("__late"))
    return lateness.agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("__late") > 0, 1).otherwise(0))
        .alias("n_late"),
        (F.sum(F.when(F.col("__late") > 0, 1).otherwise(0))
         .cast("double") / F.count("*")).alias("frac_late"),
        F.max("__late").alias("max_lateness"),
        F.percentile(F.when(F.col("__late") > 0, F.col("__late")),
                     F.lit(0.5)).alias("p50_lateness"),
        F.percentile(F.when(F.col("__late") > 0, F.col("__late")),
                     F.lit(0.99)).alias("p99_lateness"))


def join_size_estimate(left: DataFrame, right: DataFrame,
                       left_on: str, right_on: str) -> DataFrame:
    """EXACT predicted output size of ``left ⋈ right`` on an equi-key,
    before running it: one row ``(n_left, n_right, n_left_keys,
    n_right_keys, n_matched_keys, est_rows, max_key_rows,
    top_key_share)``.

    ``est_rows = Σ_k cl(k)·cr(k)`` over matched keys — the join's true
    output cardinality — computed in decimal(38,0) so two 10^9-row hot
    keys cannot overflow; ``max_key_rows`` is the largest single-key
    contribution and ``top_key_share`` its fraction of the output (the
    "will this join need salting" number).  Null keys never match and
    are excluded from the key relations (but counted in n_left/right).

    Scale notes: two map-side-combined key-count aggregations + a
    |keys|-relation join + 1-row reductions — strictly cheaper than
    the join being estimated.
    """
    ca = (left.where(F.col(left_on).isNotNull())
          .groupBy(F.col(left_on).alias("__k"))
          .agg(F.count("*").alias("__cl")))
    cb = (right.where(F.col(right_on).isNotNull())
          .groupBy(F.col(right_on).alias("__k"))
          .agg(F.count("*").alias("__cr")))
    d = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    prod = (d("__cl") * d("__cr"))
    m = (ca.join(cb, ["__k"])
         .agg(F.count("*").alias("n_matched_keys"),
              F.coalesce(F.sum(prod),
                         F.lit(0).cast("decimal(38,0)"))
              .alias("est_rows"),
              F.coalesce(F.max(prod), F.lit(0).cast("decimal(38,0)"))
              .alias("max_key_rows")))
    totals = (ca.agg(F.count("*").alias("n_left_keys"))
              .crossJoin(cb.agg(F.count("*").alias("n_right_keys")))
              .crossJoin(left.agg(F.count("*").alias("n_left")))
              .crossJoin(right.agg(F.count("*").alias("n_right"))))
    return (totals.crossJoin(m)
            .select("n_left", "n_right", "n_left_keys", "n_right_keys",
                    "n_matched_keys", "est_rows", "max_key_rows",
                    F.when(F.col("est_rows") > 0,
                           F.col("max_key_rows").cast("double")
                           / F.col("est_rows").cast("double"))
                    .alias("top_key_share")))


def column_profile(df: DataFrame, cols=None) -> DataFrame:
    """One-scan data-quality profile: one row per column with
    ``(column, n_rows, n_null, n_distinct, min_str, max_str)`` —
    exact null and distinct counts, min/max stringified so every
    column type shares one schema.  ``n_distinct`` counts non-null
    distinct values (SQL ``count(distinct)`` semantics); an all-null
    column profiles as ``(n, n, 0, null, null)``.

    Scale notes: ONE aggregation job — the multiple exact distincts
    compile to Spark's Expand strategy (the input is replicated
    |cols|-ways map-side, then one shuffle), so cost is
    O(|cols| · rows) map work, not |cols| scans.  For very wide
    tables at extreme row counts swap exact distincts for
    ``approx_count_distinct`` upstream; exactness is this operator's
    contract, so it does not silently substitute.  Stringified
    min/max follow each engine's default rendering — for doubles
    beyond ~1e7 the scientific-notation cutover differs between
    engines; quantize upstream if cross-engine string parity matters.
    """
    cols = as_list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count("*").alias("__n")]
    for i, c in enumerate(cols):
        aggs += [F.count(F.col(c)).alias(f"__nn_{i}"),
                 F.countDistinct(F.col(c)).alias(f"__nd_{i}"),
                 F.min(F.col(c)).cast("string").alias(f"__mn_{i}"),
                 F.max(F.col(c)).cast("string").alias(f"__mx_{i}")]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col("__n").alias("n_rows"),
                 (F.col("__n") - F.col(f"__nn_{i}")).alias("n_null"),
                 F.col(f"__nd_{i}").alias("n_distinct"),
                 F.col(f"__mn_{i}").alias("min_str"),
                 F.col(f"__mx_{i}").alias("max_str"))
        for i, c in enumerate(cols)])
    return (one.select(F.explode(rows).alias("__p"))
            .select("__p.*"))


# ---------------------------------------------------------------------------
# GMM-based range-selectivity estimation (EDBT'22 "Unsupervised
# Selectivity Estimation by Integrating Gaussian Mixture Models" recast
# onto this engine's own GMM kernel)


def selectivity_profile(df: DataFrame, col: str, predicates,
                        scale: int = 3, max_components: int = 6,
                        max_distinct: int = 200_000) -> DataFrame:
    """Model-based selectivity estimates for range predicates — the
    planner-support twin of ``join_size_estimate``: a small 1-D GMM
    summarizes a column's distribution so ``P(lo ≤ x ≤ hi)`` answers in
    microseconds without a scan; this operator reports the model's
    estimate NEXT TO the exact count so the caller can judge model
    fidelity before trusting it.

    Shape: the corpus reduces ONCE to the |distinct quantized values|-
    bounded histogram (fail-fast above ``max_distinct`` — coarsen
    ``scale`` instead of collecting unbounded), the GMM fits driver-side
    via the engine's own BIC-selected weighted EM
    (``kernels.gmm.fit_gmm_1d`` — the reference's model core,
    ``components/matlab_legacy.py``), and BOTH estimate and exact count
    derive from that one collected histogram: zero additional scans.
    Deterministic: exact integer histogram + deterministic EM init
    (weighted quantiles) → partition-order-invariant, golden-pinnable.

    ``predicates``: list of ``(lo, hi)`` floats (inclusive).  Output one
    row per predicate: ``(pred_id, lo, hi, est_rows, actual_rows)`` —
    ``actual_rows`` is exact AT THE QUANTIZED RESOLUTION (a raw value
    within half a grid step of a boundary counts by its rounded
    position; align predicate bounds to the ``scale`` grid to avoid
    boundary ambiguity).
    """
    import numpy as np

    from ..functions.util import quantize
    from ..kernels.gmm import fit_gmm_1d
    from ..kernels.special import norm_cdf

    preds = [(float(lo), float(hi)) for lo, hi in predicates]
    if not preds:
        raise ValueError("selectivity_profile: no predicates")
    hist = (df.where(F.col(col).isNotNull())
            .groupBy(quantize(F.col(col), scale).alias("v_u"))
            .agg(F.count("*").alias("c"))
            .orderBy("v_u")
            .limit(int(max_distinct) + 1)
            .collect())
    if len(hist) > max_distinct:
        raise ValueError(
            f"selectivity_profile: more than {max_distinct} distinct "
            f"quantized values at scale={scale}; coarsen scale")
    mul = float(10 ** scale)
    vals = np.array([r["v_u"] for r in hist], dtype=float) / mul
    cnts = np.array([r["c"] for r in hist], dtype=float)
    n = float(cnts.sum()) if len(hist) else 0.0
    rows = []
    if n > 0:
        mu, sig, mix = fit_gmm_1d(vals, weights=cnts,
                                  max_components=max_components)
        for i, (lo, hi) in enumerate(preds):
            z_hi = (hi - mu) / sig
            z_lo = (lo - mu) / sig
            p = float(np.sum(mix * (norm_cdf(z_hi) - norm_cdf(z_lo))))
            est = int(np.floor(max(p, 0.0) * n + 0.5))
            actual = int(cnts[(vals >= lo) & (vals <= hi)].sum())
            rows.append((i, lo, hi, est, actual))
    else:
        rows = [(i, lo, hi, 0, 0) for i, (lo, hi) in enumerate(preds)]
    return df.sparkSession.createDataFrame(
        rows, "pred_id int, lo double, hi double, "
              "est_rows bigint, actual_rows bigint")


def concentration(df: DataFrame, group_col: str = "source",
                  weight_col: str | None = None,
                  scale: int = 1_000_000) -> DataFrame:
    """Concentration profile of a weight (row count, token count, byte
    count, ...) across groups — the training-mix diagnostic that says
    whether a corpus is dominated by a few sources before any
    reweighting (:func:`..sampling.temperature_mixture_plan`, IPF
    raking) is attempted.

    One output row with EXACT micro-quantized integers:

    * ``hhi_micro``  — Herfindahl–Hirschman index ``Σ sᵢ²`` =
      ``(10⁶·Σwᵢ²) // W²`` (1e6 = monopoly),
    * ``gini_micro`` — Gini coefficient from the sorted-rank identity
      ``G = (2·Σ i·w₍ᵢ₎ − (n+1)·W) / (n·W)`` over ascending weights
      (tie order irrelevant: equal weights contribute the same sum),
    * ``top_share_micro`` — the largest single group's share.

    All sums run in decimal(38,0) (``Σwᵢ²`` reaches ~10³⁰ at a 10¹⁵
    token corpus) and every ratio is a truncating exact division
    (``trunc_div``) — associative, partition-order immune,
    engine-bit-identical.  Null group values form their own group; a
    null/absent weight counts 0; all-zero total yields null ratios.

    Scale shape: ONE corpus scan (map-side-combined group agg) to a
    |groups|-bounded relation; the rank + final reduction are windows
    over that bounded relation (the temperature_mixture_plan
    SinglePartition precedent) — corpus rows never shuffle twice.
    """
    from ..functions.util import DEC38, trunc_div

    w = (F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
         if weight_col else F.lit(1).cast("long"))
    g = (df.groupBy(F.col(group_col).alias("__g"))
         .agg(F.sum(w).cast(DEC38).alias("__w")))
    ranked = g.withColumn(
        "__i", F.row_number().over(
            Window.orderBy(F.col("__w").asc(), F.col("__g").asc()))
        .cast(DEC38))
    a = ranked.agg(
        F.count("*").cast(DEC38).alias("__n"),
        F.sum("__w").alias("__W"),
        F.sum(F.col("__w") * F.col("__w")).alias("__S2"),
        F.sum(F.col("__i") * F.col("__w")).alias("__SI"),
        F.max("__w").alias("__top"))
    sc = F.lit(int(scale)).cast(DEC38)
    nz = F.col("__W") > 0
    return a.select(
        F.col("__n").cast("long").alias("n_groups"),
        F.col("__W").cast("long").alias("total_weight"),
        F.when(nz, trunc_div(sc * F.col("__S2"),
                             F.col("__W") * F.col("__W"))
               .cast("long")).alias("hhi_micro"),
        F.when(nz, trunc_div(
            sc * (F.lit(2).cast(DEC38) * F.col("__SI")
                  - (F.col("__n") + 1) * F.col("__W")),
            F.col("__n") * F.col("__W")).cast("long")).alias("gini_micro"),
        F.when(nz, trunc_div(sc * F.col("__top"), F.col("__W"))
               .cast("long")).alias("top_share_micro"))


# Benford first-digit expectations, micro-quantized: floor(log10(1+1/d)
# ·1e6 + 0.5) for d = 1..9.  Frozen LITERALS (they sum to exactly 1e6),
# shared by the operator and every SQL oracle — the lockstep-constant
# idiom (experiment.mde_ab), so no engine evaluates log10 at all.
BENFORD_MICRO = [301030, 176091, 124939, 96910, 79181, 66947, 57992,
                 51153, 45757]


def benford_profile(df: DataFrame, col: str, scale: int = 6) -> DataFrame:
    """Benford's-law first-significant-digit audit of a numeric column —
    the classic fabricated-/truncated-data screen (Benford 1938; Nigrini,
    *Forensic Analytics*): organically-grown magnitudes follow
    ``P(d) = log10(1+1/d)``; flat or spiked digit profiles flag synthetic
    fills, unit clamps, or price-point artifacts.

    Cross-engine exactness: the value is first micro-quantized
    (``q = floor(|x|·10^scale + 0.5)``, the shared idiom), and the first
    digit is the first character of the INTEGER's decimal rendering —
    string-of-int is identical across engines, so no log10/pow edge can
    flip a digit at powers of ten.  Zero-q and null rows are excluded
    (they have no leading significant digit).

    Returns exactly 9 rows: ``(digit, n_obs, p_obs_u, p_exp_u, dev_u)``
    — observed share micro-truncated (``trunc_div(n_d·10^6, n)``),
    expected share the frozen literal, ``dev_u`` their signed difference.
    All-integer; zero-count digits present with ``p_obs_u = 0`` (null
    when the column is empty).

    Plan shape: ONE scan → 9-row census, left-joined onto a static
    9-digit frame; the total is a window sum over that 9-row relation
    (a second aggregate branch would scan the parquet twice — Catalyst
    has no cross-branch subplan dedup, pinned in test_plan_shapes).
    """
    from pyspark.sql import Window

    from ..functions.util import quantize, trunc_div

    dec = "decimal(38,0)"
    q = quantize(F.abs(F.col(col)), scale)
    census = (df.where(F.col(col).isNotNull())
              .select(q.alias("__q")).where(F.col("__q") > 0)
              .groupBy(F.substring(F.col("__q").cast("string"), 1, 1)
                       .cast("int").alias("digit"))
              .agg(F.count("*").alias("__c")))
    frame = (df.sparkSession.range(1, 10)
             .select(F.col("id").cast("int").alias("digit")))
    exp_map = F.element_at(
        F.array(*[F.lit(v) for v in BENFORD_MICRO]), F.col("digit"))
    wall = Window.partitionBy(F.lit(1))
    joined = (frame.join(census, ["digit"], "left")
              .select("digit",
                      F.coalesce(F.col("__c"), F.lit(0)).alias("n_obs"),
                      exp_map.alias("p_exp_u"))
              .withColumn("__n", F.sum("n_obs").over(wall).cast(dec)))
    p_obs = F.when(
        F.col("__n") > 0,
        trunc_div(F.col("n_obs").cast(dec) * F.lit(1_000_000).cast(dec),
                  F.col("__n")).cast("bigint"))
    return joined.select(
        "digit", F.col("n_obs").cast("bigint").alias("n_obs"),
        p_obs.alias("p_obs_u"), "p_exp_u",
        (p_obs - F.col("p_exp_u")).cast("bigint").alias("dev_u"))

"""Survival analysis: Kaplan–Meier time-to-event curves for churn /
conversion feature engineering.

The training-data loop constantly needs "time until the entity did X"
features with *censoring* (most users never purchase inside the
observation window; dropping them biases every naive mean).  The
Kaplan–Meier product-limit estimator (Kaplan & Meier, JASA 1958) is the
standard nonparametric answer, and it reduces to exactly the relational
shapes this engine already runs everywhere:

* one ``groupBy(duration)`` aggregation to the per-time ``(d_i, c_i)``
  counts (``d_i`` = events at ``t_i``, ``c_i`` = all subjects leaving the
  risk set at ``t_i``, events and censored alike),
* one window over that SMALL relation for the at-risk counts
  ``n_i = Σ_{t_j ≥ t_i} c_j``,
* a cumulative product over the event rows only.

Cross-engine determinism: the survival probability is *defined* here as
the integer recurrence

    ``S_0 = 10^scale;  S_i = (S_{i-1} · (n_i − d_i)) // n_i``

(floor division; every operand non-negative, so floor ≡ truncation and
DuckDB ``//``, Python ``//`` and exact big-int arithmetic all agree).
Each step loses at most one ulp at ``10^-scale``, which is part of the
contract — the point is that Spark, DuckDB (via a recursive CTE) and
numpy produce the *identical* integer for the identical input, the same
discipline as ``functions.util.quantize``.  No floating-point product,
no ``exp(sum(ln(...)))`` libm drift.

Scale shape: the only non-distributed step is the per-group cumulative
product, which runs over the KM *curve* — bounded by ``|distinct
durations|`` per group, NOT by subjects.  At 100 TB you quantize
durations to a grid first (``grid_ms``), exactly like the engine's
histogram/quantile operators bound themselves by ``|distinct quantized
values|`` (see ``experiment.qhat_from_counts``); a day-grid over a
10-year window is ≤ 3 653 curve rows per group regardless of row count.

Reference parity: the reference's threshold/curve artifacts are small
model tables derived from one full-data aggregation
(``components/spectrum/model.py`` GMM thresholds); the KM curve is the
same "reduce once, model-table out" shape pointed at event-time data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _risk_table(df: DataFrame, duration_col: str, event_col: str,
                grp: list[str], grid_ms: int | None) -> DataFrame:
    """Shared reduction for every estimator here: corpus → the
    ``|distinct (gridded) durations|``-bounded per-time relation
    ``(…grp, dur, d, c, n_at_risk)`` where ``d`` = events at ``dur``,
    ``c`` = subjects leaving the risk set at ``dur`` (events and
    censored alike), ``n_at_risk`` = subjects with duration ≥ ``dur``."""
    dur = F.col(duration_col).cast("long")
    if grid_ms is not None and grid_ms > 1:
        dur = (dur - (dur % F.lit(int(grid_ms)))).cast("long")
    ev = F.col(event_col).cast("long")

    counts = (df.where(F.col(duration_col).isNotNull())
              .groupBy(*grp, dur.alias("dur"))
              .agg(F.sum(ev).alias("d"), F.count("*").alias("c")))

    w_all = Window.partitionBy(*grp) if grp else \
        Window.partitionBy(F.lit(1))
    w_cum = (w_all.orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return counts.select(
        *grp, "dur", "d", "c",
        (F.sum("c").over(w_all) - F.sum("c").over(w_cum)
         + F.col("c")).alias("n_at_risk"))


def km_curve(df: DataFrame, duration_col: str, event_col: str,
             group_cols: list[str] | None = None,
             scale: int = 9,
             grid_ms: int | None = None) -> DataFrame:
    """Kaplan–Meier curve per group.

    ``df`` holds ONE ROW PER SUBJECT: ``duration_col`` (non-negative
    integer duration, e.g. epoch-ms delta), ``event_col`` (1 = event
    observed at that duration, 0 = right-censored there).  Null
    durations drop.  ``grid_ms`` optionally floors durations onto a
    grid FIRST — the 100-TB knob that bounds the curve size.

    Returns one row per (group, event time): ``(…group, dur, d_events,
    n_at_risk, surv_q<scale>)`` where ``surv_q<scale>`` is the integer
    recurrence defined in the module docstring (``10^scale`` ≙ 1.0),
    ordered by group then time.
    """
    grp = list(group_cols or [])
    risk = (_risk_table(df, duration_col, event_col, grp, grid_ms)
            .drop("c").where(F.col("d") > 0))

    base = 10 ** int(scale)
    surv_name = f"surv_q{int(scale)}"
    out_schema = ", ".join(
        [f"`{c}` {risk.schema[c].dataType.simpleString()}" for c in grp]
        + ["dur long", "d_events long", "n_at_risk long",
           f"{surv_name} long"])

    def _prodlimit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dur", kind="mergesort")
        s = base
        out = []
        for n, d in zip(pdf["n_at_risk"].tolist(), pdf["d"].tolist()):
            s = (s * (int(n) - int(d))) // int(n)   # exact big-int step
            out.append(s)
        res = pdf[grp + ["dur"]].copy()
        res["d_events"] = pdf["d"].astype("int64").values
        res["n_at_risk"] = pdf["n_at_risk"].astype("int64").values
        res[surv_name] = pd.array(out, dtype="int64")
        return res

    # curve rows per group ≤ |distinct (gridded) durations| — the same
    # bounded-relation contract as qhat_from_counts; the heavy reduction
    # already happened in `counts`.
    keys = grp if grp else [F.lit(1).alias("__g")]
    curve = (risk.groupBy(*keys).applyInPandas(_prodlimit, out_schema)
             if grp else
             risk.withColumn("__g", F.lit(1)).groupBy("__g")
             .applyInPandas(_prodlimit, out_schema))
    return curve.orderBy(*grp, "dur")


# exact integer division (all operands here are non-negative, so
# truncation ≡ floor): the single shared cross-engine idiom
from ..functions.util import trunc_div as _floordiv  # noqa: E402


def na_curve(df: DataFrame, duration_col: str, event_col: str,
             group_cols: list[str] | None = None,
             scale: int = 9,
             grid_ms: int | None = None) -> DataFrame:
    """Nelson–Aalen cumulative-hazard curve per group:
    ``H(t) = Σ_{t_i ≤ t} d_i / n_i`` (Nelson 1972, Aalen 1978) — the
    additive sibling of :func:`km_curve`, preferred when hazards are
    the modeling target (and the log of KM's continuous analogue).

    Determinism contract: each hazard increment is *defined* as the
    integer ``(10^scale · d_i) // n_i`` (operands non-negative, so
    floor ≡ truncation ≡ DuckDB ``//``), and the curve is the running
    integer sum — unlike KM's product there is no recurrence, so the
    WHOLE estimator is plain DataFrame ops (two windows over the
    |distinct durations|-bounded relation, zero Python) and the oracle
    is non-recursive SQL.  Per-step quantization error ≤ 10^-scale,
    additive — part of the contract, identical in every engine.

    Output per (group, event time): ``(…group, dur, d_events,
    n_at_risk, cumhaz_q<scale>)``, ordered.
    """
    grp = list(group_cols or [])
    risk = _risk_table(df, duration_col, event_col, grp, grid_ms)
    base = F.lit(10 ** int(scale)).cast("decimal(38,0)")
    term = _floordiv(base * F.col("d").cast("decimal(38,0)"),
                     F.col("n_at_risk").cast("decimal(38,0)"))
    w_cum = (Window.partitionBy(*(grp or [F.lit(1)])).orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (risk.withColumn("__h", term)
            .withColumn("__cum", F.sum("__h").over(w_cum))
            .where(F.col("d") > 0)
            .select(*grp, "dur", F.col("d").alias("d_events"),
                    "n_at_risk",
                    F.col("__cum").cast("long")
                    .alias(f"cumhaz_q{int(scale)}"))
            .orderBy(*grp, "dur"))


def logrank_test(df: DataFrame, duration_col: str, event_col: str,
                 group_col: str, grid_ms: int | None = None) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966): does group 1's survival
    differ from group 0's?  ``group_col`` must be 0/1.

    At each pooled event time ``t``: observed group-1 events ``d_1t``,
    expectation under H0 ``e_1t = d_t · n_1t / n_t``, hypergeometric
    variance ``v_t = d_t n_1t (n_t − n_1t)(n_t − d_t) /
    (n_t² (n_t − 1))``.  The statistic ``(O_1 − E_1)² / V ~ χ²(1)``.

    Exact-integer contract: ``e`` terms quantize at 1e-9 via exact
    floor division; ``v`` terms are DEFINED by the three-stage exact
    recurrence ``t1 = (10⁶·d·n₁)//n``, ``t2 = (10⁶·t1·n₀)//n``,
    ``v = (t2·(n−d))//(n−1)`` (each a floor at 10⁻⁶ relative steps,
    cumulative defect ≤ ~10⁻⁶ per event time — part of the contract);
    ``chi2_q6 = (O_1·10^9 − E_q9)² // V_q12``.  Every step is an
    integer op both engines execute identically.  Worst-case
    magnitudes: squared numerator ≤ (n·10^9)², e-numerator ≤ n²·10^9,
    v-intermediates ≤ 10⁶·t1·n ≤ 10¹²·n²/4 — all inside
    decimal(38,0)/hugeint up to n ≈ 3·10^9 subjects (a SINGLE-stage
    ``10¹²·d·n₁·n₀·(n−d)`` would overflow past n ≈ 6·10⁶).

    Scale shape: ONE grouped aggregation to the per-(time, group)
    relation, a pivot to per-time columns, then a single global
    aggregate over |distinct event times| rows.  Output one row:
    ``(n_times, o1, e1_q9, v_q12, chi2_q6)``.
    """
    _DEC = "decimal(38,0)"
    g = F.col(group_col).cast("long")
    dur = F.col(duration_col).cast("long")
    if grid_ms is not None and grid_ms > 1:
        dur = (dur - (dur % F.lit(int(grid_ms)))).cast("long")
    ev = F.col(event_col).cast("long")
    # both groups interleaved on ONE pooled time axis (a per-group risk
    # table would lack rows at the other group's event times, skewing
    # the risk sets): per-dur event + leaver counts for each arm, then
    # suffix sums give each arm's risk set at every pooled time.
    per = (df.where(g.isin(0, 1) & F.col(duration_col).isNotNull())
           .groupBy(dur.alias("dur"))
           .agg(F.sum(F.when(g == 1, ev).otherwise(0)).alias("d1g"),
                F.sum(F.when(g == 0, ev).otherwise(0)).alias("d0g"),
                F.sum(F.when(g == 1, 1).otherwise(0)).alias("c1"),
                F.sum(F.when(g == 0, 1).otherwise(0)).alias("c0")))
    w_all = Window.partitionBy(F.lit(1))
    w_cum = (w_all.orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    def _risk(c):
        return (F.sum(c).over(w_all) - F.sum(c).over(w_cum) + F.col(c))

    per = (per.withColumn("n1", _risk("c1").cast(_DEC))
           .withColumn("n0x", _risk("c0").cast(_DEC))
           .select("dur",
                   (F.col("d1g") + F.col("d0g")).cast(_DEC)
                   .alias("d_all"),
                   F.col("d1g").cast(_DEC).alias("d1"),
                   (F.col("n1") + F.col("n0x")).alias("n_all"), "n1")
           .where(F.col("d_all") > 0))
    b9 = F.lit(10 ** 9).cast(_DEC)
    b6 = F.lit(10 ** 6).cast(_DEC)
    e_t = _floordiv(b9 * F.col("d_all") * F.col("n1"), F.col("n_all"))
    n0 = F.col("n_all") - F.col("n1")
    # three-stage exact division (see docstring): a single-stage
    # 10^12*d*n1*n0*(n-d) product overflows decimal(38,0) past n~6e6
    t1 = _floordiv(b6 * F.col("d_all") * F.col("n1"), F.col("n_all"))
    t2 = _floordiv(b6 * t1 * n0, F.col("n_all"))
    v_t = F.when(F.col("n_all") > 1,
                 _floordiv(t2 * (F.col("n_all") - F.col("d_all")),
                           F.col("n_all") - F.lit(1).cast(_DEC))
                 ).otherwise(F.lit(0)).cast(_DEC)
    agg = per.agg(
        F.count("*").cast("long").alias("n_times"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum(e_t).cast(_DEC).alias("e1_q9"),
        F.sum(v_t).cast(_DEC).alias("v_q12"))
    diff = F.col("o1").cast(_DEC) * b9 - F.col("e1_q9")
    chi2 = F.when(F.col("v_q12") > 0,
                  _floordiv(diff * diff, F.col("v_q12"))).otherwise(None)
    return agg.select(
        "n_times", "o1",
        F.col("e1_q9").cast("long").alias("e1_q9"),
        F.col("v_q12").cast("long").alias("v_q12"),
        chi2.cast("long").alias("chi2_q6"))


def time_to_event(events: DataFrame, entity_col: str, ts_col: str,
                  event_pred, origin_pred=None) -> DataFrame:
    """Per-entity ``(duration_ms, event)`` pairs from an event log.

    Origin = the entity's first event matching ``origin_pred`` (default:
    first event of any kind); event time = first event matching
    ``event_pred``.  Entities whose event never occurs are censored at
    their LAST observed activity (the standard last-seen censoring).
    Entities with no origin row drop.  One aggregation, no joins wider
    than |entities|.
    """
    e = F.col(entity_col)
    ts = F.unix_millis(F.col(ts_col).cast("timestamp"))
    origin = F.min(F.when(origin_pred, ts) if origin_pred is not None
                   else ts).alias("origin_ms")
    agg = events.groupBy(e.alias("entity")).agg(
        origin,
        F.min(F.when(event_pred, ts)).alias("event_ms"),
        F.max(ts).alias("last_ms"),
    ).where(F.col("origin_ms").isNotNull())
    return agg.select(
        "entity",
        (F.coalesce(F.col("event_ms"), F.col("last_ms"))
         - F.col("origin_ms")).alias("duration_ms"),
        F.col("event_ms").isNotNull().cast("int").alias("event"),
    ).where(F.col("duration_ms") >= 0)


def rmst(df: DataFrame, duration_col: str, event_col: str,
         tau: int, group_cols: list[str] | None = None,
         scale: int = 9, grid_ms: int | None = None) -> DataFrame:
    """Restricted mean survival time per group: ``∫₀^τ S(t) dt`` — the
    standard scalar summary of a KM curve ("expected event-free time
    inside the first τ ms"), robust where the unrestricted mean is
    undefined under censoring (Royston & Parmar 2013).

    Pure step-function integration over the :func:`km_curve` output —
    S is constant between event times, so

        ``RMST = Σ_i S_{i-1}·(t'_i − t'_{i-1}) + S_N·(τ − t'_N)``

    with ``t'_i = min(t_i, τ)``, ``S_0 = 10^scale``, ``t'_0 = 0``.
    Every term is integer×integer on the CURVE relation (one lag
    window + one aggregation per group — zero extra corpus scans), so
    the result inherits km_curve's engine/partition determinism
    exactly.  Output units are ``10^-scale · ms``: callers at
    realistic τ (years) should keep the decimal column or rescale —
    the long cast here is exact while ``τ·10^scale < 2^63``
    (τ ≤ ~106 days at scale=9; pass ``scale=6`` for multi-year τ).

    Output one row per group: ``(…group, tau_ms, n_event_times,
    rmst_q<scale>ms)``, ordered by group.
    """
    grp = list(group_cols or [])
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    curve = km_curve(df, duration_col, event_col, grp or None,
                     scale=scale, grid_ms=grid_ms)
    base = 10 ** int(scale)
    dec = "decimal(38,0)"
    w = Window.partitionBy(*(grp or [F.lit(1)])).orderBy("dur")
    tcl = F.least(F.col("dur"), F.lit(int(tau))).cast("long")
    surv = F.col(f"surv_q{int(scale)}").cast(dec)
    seg = (curve
           .withColumn("__t", tcl)
           .withColumn("__t_prev",
                       F.lag("__t", 1, 0).over(w).cast("long"))
           .withColumn("__s_prev",
                       F.lag(surv, 1, base).over(w).cast(dec))
           .withColumn("__contrib",
                       F.col("__s_prev")
                       * (F.col("__t") - F.col("__t_prev")).cast(dec)))
    name = f"rmst_q{int(scale)}ms"
    out = (seg.groupBy(*grp)
           .agg(F.count("*").cast("long").alias("n_event_times"),
                (F.sum("__contrib")
                 + F.max_by(surv, F.col("dur"))
                 * (F.lit(int(tau)).cast(dec)
                    - F.max("__t").cast(dec))).cast("long").alias(name))
           .select(*grp, F.lit(int(tau)).cast("long").alias("tau_ms"),
                   "n_event_times", name))
    return out.orderBy(*grp) if grp else out


def time_to_competing_event(events: DataFrame, entity_col: str,
                            ts_col: str, cause_preds: list) -> DataFrame:
    """Per-entity ``(duration_ms, cause)`` for COMPETING risks: cause
    ``j+1`` fires if ``cause_preds[j]``'s first occurrence is the
    earliest among all causes (ties break to the LOWER cause index —
    deterministic, documented); entities where no cause ever fires are
    censored (``cause = 0``) at their last observed activity.  Origin =
    first event of any kind.  One aggregation, |entities|-bounded."""
    e = F.col(entity_col)
    ts = F.unix_millis(F.col(ts_col).cast("timestamp"))
    aggs = [F.min(ts).alias("origin_ms"), F.max(ts).alias("last_ms")]
    for j, pred in enumerate(cause_preds):
        aggs.append(F.min(F.when(pred, ts)).alias(f"t{j}"))
    agg = (events.groupBy(e.alias("entity")).agg(*aggs)
           .where(F.col("origin_ms").isNotNull()))
    # earliest cause wins; ties -> lowest index (least() skips nulls)
    tcols = [F.col(f"t{j}") for j in range(len(cause_preds))]
    t_min = F.least(*tcols) if len(tcols) > 1 else tcols[0]
    cause = F.lit(0)
    for j in reversed(range(len(cause_preds))):
        cause = F.when(tcols[j].isNotNull() & (tcols[j] == t_min),
                       F.lit(j + 1)).otherwise(cause)
    return (agg.select(
        "entity",
        (F.coalesce(t_min, F.col("last_ms"))
         - F.col("origin_ms")).alias("duration_ms"),
        cause.cast("int").alias("cause"))
        .where(F.col("duration_ms") >= 0))


def cif_curves(df: DataFrame, duration_col: str, cause_col: str,
               n_causes: int = 2,
               group_cols: list[str] | None = None,
               scale: int = 9,
               grid_ms: int | None = None) -> DataFrame:
    """Aalen–Johansen cumulative incidence functions under competing
    risks: ``CIF_j(t) = Σ_{t_i ≤ t} S(t_{i-1}) · d_{ij} / n_i`` with
    ``S`` the ALL-CAUSE Kaplan–Meier — the correct "probability cause
    j has happened by t" (1 − KM-per-cause overstates it by treating
    competitors as censoring; Aalen & Johansen 1978).

    ``cause_col``: 0 = censored, 1..n_causes = event cause.

    Determinism: the KM recurrence and each CIF increment
    ``(S_prev · d_j) // n`` are exact big-int floor steps at
    ``10^-scale`` (same contract as :func:`km_curve`; the oracle
    carries S and every CIF through one recursive CTE in lockstep).
    By construction ``S + Σ_j CIF_j ≤ 10^scale`` with deficit bounded
    by one ulp per event time (each of the J+1 floors loses < 1).

    Scale shape identical to km_curve: ONE corpus reduction to the
    |distinct (gridded) durations| relation; the recurrence runs over
    CURVE rows per group.  Output per (group, event time): ``(…group,
    dur, d_all, n_at_risk, surv_q<s>, cif1_q<s>, …, cifJ_q<s>)``.
    """
    grp = list(group_cols or [])
    causes = list(range(1, int(n_causes) + 1))
    dur = F.col(duration_col).cast("long")
    if grid_ms is not None and grid_ms > 1:
        dur = (dur - (dur % F.lit(int(grid_ms)))).cast("long")
    cz = F.col(cause_col).cast("int")

    counts = (df.where(F.col(duration_col).isNotNull()
                       & cz.isNotNull())
              .groupBy(*grp, dur.alias("dur"))
              .agg(F.sum(F.when(cz > 0, 1).otherwise(0)).alias("d"),
                   F.count("*").alias("c"),
                   *[F.sum(F.when(cz == j, 1).otherwise(0))
                     .alias(f"d{j}") for j in causes]))
    w_all = Window.partitionBy(*grp) if grp else \
        Window.partitionBy(F.lit(1))
    w_cum = (w_all.orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = counts.select(
        *grp, "dur", "d", *[f"d{j}" for j in causes],
        (F.sum("c").over(w_all) - F.sum("c").over(w_cum)
         + F.col("c")).alias("n_at_risk"),
    ).where(F.col("d") > 0)

    base = 10 ** int(scale)
    cif_names = [f"cif{j}_q{int(scale)}" for j in causes]
    surv_name = f"surv_q{int(scale)}"
    out_schema = ", ".join(
        [f"`{c}` {risk.schema[c].dataType.simpleString()}" for c in grp]
        + ["dur long", "d_all long", "n_at_risk long",
           f"{surv_name} long"] + [f"{n} long" for n in cif_names])

    def _aj(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dur", kind="mergesort")
        s = base
        cif = [0] * len(causes)
        s_out, cif_out = [], [[] for _ in causes]
        d_cols = [pdf[f"d{j}"].tolist() for j in causes]
        for i, (n, d) in enumerate(zip(pdf["n_at_risk"].tolist(),
                                       pdf["d"].tolist())):
            for jx in range(len(causes)):
                cif[jx] += (s * int(d_cols[jx][i])) // int(n)
                cif_out[jx].append(cif[jx])
            s = (s * (int(n) - int(d))) // int(n)
            s_out.append(s)
        res = pdf[grp + ["dur"]].copy()
        res["d_all"] = pdf["d"].astype("int64").values
        res["n_at_risk"] = pdf["n_at_risk"].astype("int64").values
        res[surv_name] = pd.array(s_out, dtype="int64")
        for jx, nme in enumerate(cif_names):
            res[nme] = pd.array(cif_out[jx], dtype="int64")
        return res

    keys = grp if grp else [F.lit(1).alias("__g")]
    curve = (risk.groupBy(*keys).applyInPandas(_aj, out_schema)
             if grp else
             risk.withColumn("__g", F.lit(1)).groupBy("__g")
             .applyInPandas(_aj, out_schema))
    return curve.orderBy(*grp, "dur")

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
    # n_at_risk = subjects with duration >= this row's time
    risk = counts.select(
        *grp, "dur", "d",
        (F.sum("c").over(w_all) - F.sum("c").over(w_cum)
         + F.col("c")).alias("n_at_risk"),
    ).where(F.col("d") > 0)

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

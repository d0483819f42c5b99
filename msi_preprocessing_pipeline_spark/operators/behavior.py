"""Behavioral analytics: funnels, cohort retention, interval coverage.

Three operators that turn an event stream ``(entity, ts, type, ...)``
into the standard product-analytics artifacts:

* :func:`funnel_times` / :func:`funnel_report` — earliest strictly
  ordered completion of a k-step event funnel per entity, plus the
  per-step user counts and conversion ratios.
* :func:`cohort_activity` — weekly/daily cohort retention matrix
  (cohort period × period offset → active users, retention rate).
* :func:`interval_coverage` — per-key length of the UNION of a set of
  possibly-overlapping integer intervals (plus interval/component
  counts), the classic sweep-line merge as one window pass.

All counts are exact integers; every ratio is a single double division
of exact int64 counts — engine-portable bit-for-bit.

Scale notes (10^12-row event streams):

* ``funnel_times`` shuffles the corpus ONCE (hash by entity).  Step
  times are k chained unordered window-min expressions over the same
  partition spec — Catalyst plans one Exchange + one sort, and the
  final per-entity aggregate reuses the partitioning (no second
  corpus exchange).  The per-group state is k scalars, so entity skew
  (one user with 10^8 events) costs a scan, never memory.
* ``funnel_report`` reduces the times relation to ONE row (partial
  aggregation) and explodes k report rows from it driver-free.
* ``cohort_activity`` folds first-event period AND the distinct
  active-period set into a SINGLE per-entity aggregation (the
  ``collect_set`` state is bounded by the number of periods in the
  retention horizon — e.g. 52 for a year of weeks — NOT by the
  entity's event count).  The matrix aggregation that follows is
  map-side combined; cohort sizes come from the matrix's own
  offset-0 rows (|cohorts|-bounded join, AQE broadcasts).
* ``interval_coverage`` is ONE window pass: running ``max(end)`` over
  ``(key ORDER BY start, end)`` gives each row its clamped novel
  contribution, and the per-key sum reuses the window's partitioning
  — no component ids, no self-join, no second exchange.

Reference parity: the reference's staged pipeline gates each stage on
the previous stage's artifact (``pipeline/run.py``) — the funnel is
the same "earliest time stage i completed after stage i-1" recurrence
over event payloads; the interval merge is the same cummax sweep used
by ``dedup.duplicate_spans`` (Lee et al. substring spans) and mirrors
the reference's sorted-neighborhood component merging
(``components/spectrum/model.py``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.util import as_list as _as_list

_PERIOD_DAYS = {"day": 1, "week": 7}


def funnel_times(df: DataFrame, entity_col: str, ts_col: str,
                 type_col: str, steps: Sequence[str],
                 within_ms: int | None = None) -> DataFrame:
    """One row per entity that reached step 1: ``(entity, t_1 .. t_k)``
    where ``t_1`` is the entity's earliest ``steps[0]`` event and
    ``t_i`` the earliest ``steps[i-1]`` event STRICTLY after
    ``t_{i-1}`` (and, when ``within_ms`` is set, no later than
    ``t_1 + within_ms``).  Unreached steps are null; null
    entity/ts/type rows are ignored (they order nothing).

    Strict ``>`` makes repeated step types well-defined (a
    ``click -> click`` funnel needs two distinct click times) and
    keeps the recurrence deterministic under same-timestamp ties.
    """
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    if within_ms is not None and within_ms <= 0:
        raise ValueError(f"within_ms must be positive, got {within_ms}")
    ev = (df.where(F.col(entity_col).isNotNull()
                   & F.col(ts_col).isNotNull()
                   & F.col(type_col).isNotNull())
          .select(F.col(entity_col),
                  F.unix_millis(F.col(ts_col).cast("timestamp"))
                  .alias("__ms"),
                  F.col(type_col).alias("__et")))
    w = Window.partitionBy(entity_col)
    # Chained selects: each step's min references the previous step's
    # column, so the windows cannot fuse into one node — but they share
    # the partition spec, costing ONE Exchange + sort for all k.
    cur = ev.select(entity_col, "__ms", "__et",
                    F.min(F.when(F.col("__et") == steps[0],
                                 F.col("__ms"))).over(w).alias("__t1"))
    for i in range(2, len(steps) + 1):
        cond = ((F.col("__et") == steps[i - 1])
                & (F.col("__ms") > F.col(f"__t{i - 1}")))
        if within_ms is not None:
            cond = cond & (F.col("__ms") <= F.col("__t1") + within_ms)
        cur = cur.select("*", F.min(F.when(cond, F.col("__ms")))
                         .over(w).alias(f"__t{i}"))
    out = (cur.groupBy(entity_col)
           .agg(*[F.max(f"__t{i}").alias(f"__m{i}")
                  for i in range(1, len(steps) + 1)])
           .where(F.col("__m1").isNotNull()))
    return out.select(
        entity_col,
        *[F.timestamp_millis(F.col(f"__m{i}")).alias(f"t_{i}")
          for i in range(1, len(steps) + 1)])


def funnel_report(df: DataFrame, entity_col: str, ts_col: str,
                  type_col: str, steps: Sequence[str],
                  within_ms: int | None = None) -> DataFrame:
    """k-row funnel summary: ``(step, event_type, n_entities,
    conv_from_prev, conv_from_first)``.

    ``n_entities`` counts entities whose ``t_step`` is non-null;
    ``conv_from_prev``/``conv_from_first`` are single double divisions
    of those exact counts (null for step 1 and whenever the
    denominator is 0).
    """
    times = funnel_times(df, entity_col, ts_col, type_col, steps,
                         within_ms=within_ms)
    k = len(steps)
    one = times.agg(*[F.count(f"t_{i}").alias(f"n{i}")
                      for i in range(1, k + 1)])
    rows = one.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("step"),
                 F.lit(steps[i - 1]).alias("event_type"),
                 F.col(f"n{i}").alias("n_entities"),
                 (F.col(f"n{i - 1}") if i > 1
                  else F.lit(None).cast("long")).alias("__np"),
                 F.col("n1").alias("__n1"))
        for i in range(1, k + 1)])).alias("r")).select("r.*")
    return rows.select(
        "step", "event_type", "n_entities",
        F.when(F.col("__np") > 0,
               F.col("n_entities").cast("double") / F.col("__np"))
        .alias("conv_from_prev"),
        F.when((F.col("__n1") > 0) & (F.col("step") > 1),
               F.col("n_entities").cast("double") / F.col("__n1"))
        .alias("conv_from_first"))


def cohort_activity(df: DataFrame, entity_col: str, ts_col: str,
                    period: str = "week") -> DataFrame:
    """Cohort retention matrix: ``(cohort_period, period_offset,
    n_active, cohort_size, retention)``.

    An entity's cohort is the truncated period of its FIRST event;
    it is active at offset d if it has any event in the period d
    periods later.  ``retention = n_active / cohort_size`` where
    ``cohort_size`` is the matrix's own offset-0 count (every entity
    is active in its first period by construction, so offset 0 rows
    exist for every cohort).  Null entity/ts rows are ignored.
    """
    if period not in _PERIOD_DAYS:
        raise ValueError(
            f"period must be one of {sorted(_PERIOD_DAYS)}, got {period!r}")
    days = _PERIOD_DAYS[period]
    ev = df.where(F.col(entity_col).isNotNull()
                  & F.col(ts_col).isNotNull())
    per_entity = (ev.groupBy(entity_col)
                  .agg(F.date_trunc(period, F.min(ts_col)).alias("__cohort"),
                       F.collect_set(F.date_trunc(period, F.col(ts_col)))
                       .alias("__periods")))
    cells = (per_entity
             .select("__cohort", F.explode("__periods").alias("__p"))
             .select(F.col("__cohort").alias("cohort_period"),
                     F.floor(F.datediff(F.col("__p"), F.col("__cohort"))
                             / days).cast("int").alias("period_offset")))
    matrix = (cells.groupBy("cohort_period", "period_offset")
              .agg(F.count("*").alias("n_active")))
    sizes = (matrix.where(F.col("period_offset") == 0)
             .select("cohort_period",
                     F.col("n_active").alias("cohort_size")))
    return (matrix.join(sizes, ["cohort_period"])
            .select("cohort_period", "period_offset", "n_active",
                    "cohort_size",
                    (F.col("n_active").cast("double")
                     / F.col("cohort_size")).alias("retention")))


def interval_coverage(df: DataFrame, key_col: str, start_col: str,
                      end_col: str) -> DataFrame:
    """Per-key union-of-intervals summary over integer interval columns
    ``[start, end)``: ``(key, n_intervals, n_components, covered)``
    where ``covered`` is the total length of the union and
    ``n_components`` the number of disjoint merged runs.

    Rows with null key/start/end or ``end < start`` are dropped
    (an inverted interval identifies nothing); zero-length intervals
    are kept (they count as intervals, may bridge nothing, and cover
    0).  Exact int64 arithmetic throughout.
    """
    iv = df.where(F.col(key_col).isNotNull()
                  & F.col(start_col).isNotNull()
                  & F.col(end_col).isNotNull()
                  & (F.col(end_col) >= F.col(start_col)))
    w = (Window.partitionBy(key_col).orderBy(start_col, end_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    prev_max: Column = F.max(F.col(end_col)).over(w)
    swept = iv.select(
        F.col(key_col),
        F.when(prev_max.isNull() | (F.col(start_col) > prev_max), 1)
        .otherwise(0).alias("__new_comp"),
        F.greatest(
            F.col(end_col) - F.greatest(F.col(start_col),
                                        F.coalesce(prev_max,
                                                   F.col(start_col))),
            F.lit(0)).alias("__cov"))
    return (swept.groupBy(key_col)
            .agg(F.count("*").alias("n_intervals"),
                 F.sum("__new_comp").alias("n_components"),
                 F.sum("__cov").alias("covered")))


def top_paths(df: DataFrame, entity_col: str, ts_col: str,
              type_col: str = "event_type", max_steps: int = 5,
              k: int = 20, sep: str = ">",
              tiebreak: Sequence[str] | str = ()) -> DataFrame:
    """Most common event-type paths: each entity's time-ordered first
    ``max_steps`` event types joined into one path string, censused
    corpus-wide — ``(path, n_entities, n_truncated, truncated_frac)``
    for the top ``k`` paths by count (ties broken by path string
    ascending, so the cut is deterministic).  ``n_truncated`` counts
    the path's entities that had MORE than ``max_steps`` events (their
    path is a prefix, not the full journey) — reported, not hidden;
    ``truncated_frac`` is its exact-int ratio (compare on the counts
    for bit-level cross-engine checks — a rounded ratio can land on a
    decimal midpoint).

    Null event types render as ``'∅'`` inside the path (they are real
    steps); entities with no events don't exist in the input by
    definition.  ``ts_col`` plus ``tiebreak`` must totally order each
    entity's events or the path is partition-dependent — pass the
    event id like every other ordered operator here.

    Scale notes: one entity-hash shuffle (window row_number + one
    aggregation on the same key, Exchange reused), then a
    |distinct paths|-bounded census aggregation (paths are ≤
    ``max_steps`` types — a small-vocabulary space) and a top-k
    ``TakeOrderedAndProject``.  Entity skew costs a sort, never
    memory (the path keeps only ``max_steps`` steps).
    """
    if max_steps < 1 or k < 1:
        raise ValueError(
            f"need max_steps >= 1 and k >= 1, got {max_steps}, {k}")
    order = [F.col(ts_col)] + [F.col(c) for c in _as_list(tiebreak)]
    w = Window.partitionBy(entity_col).orderBy(*order)
    stepped = df.select(
        F.col(entity_col).alias("__e"),
        F.coalesce(F.col(type_col).cast("string"), F.lit("∅"))
        .alias("__t"),
        F.row_number().over(w).alias("__rn"))
    per_entity = (stepped
                  .groupBy("__e")
                  .agg(F.concat_ws(sep, F.array_sort(F.collect_list(
                      F.when(F.col("__rn") <= max_steps,
                             F.struct(F.col("__rn").alias("rn"),
                                      F.col("__t").alias("t"))))).getField("t"))
                       .alias("path"),
                       F.max("__rn").alias("__n_ev")))
    census = (per_entity.groupBy("path")
              .agg(F.count("*").alias("n_entities"),
                   F.sum(F.when(F.col("__n_ev") > max_steps, 1)
                         .otherwise(0)).alias("n_truncated"))
              .withColumn("truncated_frac",
                          F.col("n_truncated").cast("double")
                          / F.col("n_entities").cast("double")))
    return (census.orderBy(F.col("n_entities").desc(), F.col("path"))
            .limit(k))


def audience_overlap(df: DataFrame, entity_col: str,
                     type_col: str = "event_type") -> DataFrame:
    """Pairwise audience overlap between segments: for every ordered
    pair of distinct ``type_col`` values ``(a, b)`` with ``a < b``,
    the exact entity counts ``(type_a, type_b, n_a, n_b, n_both,
    jaccard)`` where ``n_both`` is entities seen in BOTH segments and
    ``jaccard = n_both / (n_a + n_b - n_both)`` — the exact companion
    of the Theta-sketch overlap (``sketches.theta_*``) for
    segment-cardinality planning.  Null types and null entities are
    excluded (they name no segment / no entity); pairs with zero
    co-audience still appear (their absence would read as "not
    computed").

    Scale notes: one distinct (entity, type) pass, a per-entity
    type-set self-join bounded by each entity's segment count (an
    entity in t types contributes t·(t−1)/2 pair rows — |types| is
    small by construction of a segment column), one |types|²-bounded
    aggregation, and a |types| marginal broadcast join.  No windows;
    the heavy relation never exceeds distinct-(entity,type).
    """
    base = (df.where(F.col(entity_col).isNotNull()
                     & F.col(type_col).isNotNull())
            .select(F.col(entity_col).alias("__e"),
                    F.col(type_col).alias("__t"))
            .distinct())
    a = base.select("__e", F.col("__t").alias("type_a"))
    b = base.select("__e", F.col("__t").alias("type_b"))
    both = (a.join(b, ["__e"])
            .where(F.col("type_a") < F.col("type_b"))
            .groupBy("type_a", "type_b")
            .agg(F.count("*").alias("n_both")))
    marg = base.groupBy(F.col("__t")).agg(F.count("*").alias("__n"))
    ma = marg.select(F.col("__t").alias("type_a"),
                     F.col("__n").alias("n_a"))
    mb = marg.select(F.col("__t").alias("type_b"),
                     F.col("__n").alias("n_b"))
    pairs = (ma.crossJoin(mb)
             .where(F.col("type_a") < F.col("type_b")))
    return (pairs.join(both, ["type_a", "type_b"], "left")
            .select("type_a", "type_b", "n_a", "n_b",
                    F.coalesce("n_both", F.lit(0)).alias("n_both"),
                    (F.coalesce("n_both", F.lit(0)).cast("double")
                     / (F.col("n_a") + F.col("n_b")
                        - F.coalesce("n_both", F.lit(0))).cast("double"))
                    .alias("jaccard")))


def attribution(conversions: DataFrame, touches: DataFrame,
                entity_col: str = "user_id", conv_ts: str = "ts",
                touch_ts: str = "ts", touch_id: str = "event_id",
                horizon_ms: int = 86_400_000,
                conv_id: str = "event_id") -> DataFrame:
    """First/last-touch conversion attribution within a lookback horizon.

    For each conversion, over the touches of the same entity with
    ``conv_ts − horizon ≤ touch_ts < conv_ts`` (strictly before — zero
    leakage of the conversion instant itself): the earliest touch
    (first-touch credit), the latest (last-touch credit) and the touch
    count. Conversions with no touch in the horizon keep their row with
    nulls (n_touches 0).

    Output: ``(conv_id, entity, conv_ms, first_touch_id, first_touch_ms,
    last_touch_id, last_touch_ms, n_touches)``.

    Scale shape: the union + single-window trick shared with
    ``training.pit_window_agg`` — tag touches side 0 / conversions side
    1, ONE window per entity ordered by ``(ms, side)`` with a trailing
    RANGE frame ``[−horizon, −1]``, take ``min/max(struct(ms, id))``
    over the frame. One shuffle of the union, no join, entity skew costs
    a scan (window state is two structs + a count). Ties among touches
    at the same ms break by id (struct comparison) — deterministic.
    """
    t = touches.select(
        F.col(entity_col).alias("__e"),
        F.col(touch_ts).alias("__ms"),
        F.lit(0).alias("__side"),
        F.col(touch_id).alias("__tid"),
        F.lit(None).alias("__cid"))
    c = conversions.select(
        F.col(entity_col).alias("__e"),
        F.col(conv_ts).alias("__ms"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(touches.schema[touch_id].dataType).alias("__tid"),
        F.col(conv_id).alias("__cid"))
    u = t.unionByName(c)
    w = (Window.partitionBy("__e").orderBy("__ms")
         .rangeBetween(-int(horizon_ms), -1))
    tch = F.when(F.col("__side") == 0,
                 F.struct(F.col("__ms").alias("ms"),
                          F.col("__tid").alias("tid")))
    first = F.min(tch).over(w)
    last = F.max(tch).over(w)
    n = F.count(tch).over(w)
    return (u.select("__e", "__ms", "__side", "__cid",
                     first.alias("__f"), last.alias("__l"),
                     n.alias("n_touches"))
            .where(F.col("__side") == 1)
            .select(F.col("__cid").alias("conv_id"),
                    F.col("__e").alias(entity_col),
                    F.col("__ms").alias("conv_ms"),
                    F.col("__f.tid").alias("first_touch_id"),
                    F.col("__f.ms").alias("first_touch_ms"),
                    F.col("__l.tid").alias("last_touch_id"),
                    F.col("__l.ms").alias("last_touch_ms"),
                    "n_touches"))


def attribution_shares(conversions: DataFrame, touches: DataFrame,
                       model: str = "linear",
                       entity_col: str = "user_id",
                       conv_ts: str = "ms", touch_ts: str = "ms",
                       touch_id: str = "event_id",
                       conv_id: str = "event_id",
                       horizon_ms: int = 86_400_000,
                       halflife_ms: int = 3_600_000,
                       position_split=(40, 20, 40),
                       scale: int = 1_000_000) -> DataFrame:
    """Multi-touch conversion attribution: EXACT integer credit shares
    of each conversion across its lookback-horizon touches under one of
    the three standard models —

    * ``linear``      — equal credit per touch,
    * ``position``    — U-shaped: ``position_split = (first%, middle%,
      last%)``; with one touch it takes everything, with two the
      first/last split renormalizes (40/40 → 50/50),
    * ``time_decay``  — credit ∝ 2^(−age/halflife) with the age
      bucketed to integer halflives, so weights are exact powers of two
      (``pow`` with fractional exponents drifts by 1 ulp across
      engines — the temperature_mixture_plan T = 2 rationale).

    All three models produce integer weights, and each conversion's
    ``scale`` credit units are split by the Hamilton largest-remainder
    method (the ``temperature_mixture_plan`` idiom): quotas are exact
    decimal ``div``/``%``, remainder ties break by touch rank — so
    ``sum(credit) = scale`` EXACTLY per conversion, partition-order
    immune and engine-bit-identical.  Touches strictly before the
    conversion instant only (zero leakage).  Conversions with no touch
    in the horizon emit no rows.

    Timestamps are integer epoch-millis columns.  Returns
    ``(conv_id, touch_id, touch_rank, n_touches, credit)`` with
    ``touch_rank`` 1-based oldest-first (ties by touch id).

    Scale shape: one equi-join on the entity plus the horizon range
    predicate (AQE broadcasts whichever side is small; per-entity skew
    is bounded by touches-per-horizon, not corpus size), then three
    windows PARTITIONED BY CONVERSION — group state is one
    conversion's touch list, never an entity's history.  No collect,
    no Python.
    """
    from ..functions.util import DEC38, trunc_div

    if model not in ("linear", "position", "time_decay"):
        raise ValueError(f"unknown model {model!r}")
    pf, pm, pl = (int(x) for x in position_split)
    if model == "position" and (min(pf, pm, pl) < 0 or pf + pm + pl <= 0):
        raise ValueError(f"bad position_split {position_split}")
    if model == "time_decay":
        if halflife_ms < 1:
            raise ValueError("halflife_ms must be >= 1")
        if horizon_ms // halflife_ms > 62:
            raise ValueError("horizon/halflife > 62 overflows the "
                             "power-of-two weight; raise halflife_ms")
    c = conversions.select(
        F.col(entity_col).alias("__e"),
        F.col(conv_ts).cast("long").alias("__cms"),
        F.col(conv_id).alias("__cid"))
    t = touches.select(
        F.col(entity_col).alias("__te"),
        F.col(touch_ts).cast("long").alias("__tms"),
        F.col(touch_id).alias("__tid"))
    pairs = c.join(
        t, (F.col("__e") == F.col("__te"))
        & (F.col("__tms") >= F.col("__cms") - F.lit(int(horizon_ms)))
        & (F.col("__tms") < F.col("__cms")))
    wc = Window.partitionBy("__cid")
    wr = wc.orderBy(F.col("__tms").asc(), F.col("__tid").asc())
    pairs = (pairs.withColumn("__r", F.row_number().over(wr))
             .withColumn("__n", F.count("*").over(wc)))
    if model == "linear":
        w = F.lit(1).cast("long")
    elif model == "position":
        mid = F.greatest(F.col("__n") - 2, F.lit(1)).cast("long")
        w = (F.when(F.col("__n") == 1, F.lit(1))
             .when(F.col("__r") == 1, F.lit(pf) * mid)
             .when(F.col("__r") == F.col("__n"), F.lit(pl) * mid)
             .otherwise(F.lit(pm))).cast("long")
    else:
        k = F.expr(f"(__cms - __tms) div {int(halflife_ms)}")
        pairs = pairs.withColumn("__k", k)
        # newest touch (smallest k) carries the LARGEST weight: scale
        # every 2^(-k) by 2^(max k) so weights are exact integers
        # (shiftleft needs the bit count as a column -> expr form)
        pairs = pairs.withColumn(
            "__ksh", (F.max("__k").over(wc) - F.col("__k")).cast("int"))
        w = F.expr("shiftleft(cast(1 as bigint), __ksh)")
    pairs = pairs.withColumn("__w", w.cast(DEC38))
    tot = F.sum("__w").over(wc)
    num = F.lit(int(scale)).cast(DEC38) * F.col("__w")
    pairs = (pairs.withColumn("__base", trunc_div(num, tot))
             .withColumn("__rem", num % tot))
    r_sum = F.sum("__base").over(wc)
    w_ham = wc.orderBy(F.col("__rem").desc(), F.col("__r").asc())
    pairs = (pairs.withColumn("__left",
                              F.lit(int(scale)).cast(DEC38) - r_sum)
             .withColumn("__hrk", F.row_number().over(w_ham)))
    credit = (F.col("__base")
              + F.when(F.col("__hrk") <= F.col("__left"), 1)
              .otherwise(0)).cast("long")
    return pairs.select(
        F.col("__cid").alias("conv_id"),
        F.col("__tid").alias("touch_id"),
        F.col("__r").alias("touch_rank"),
        F.col("__n").alias("n_touches"),
        credit.alias("credit"))

"""Online duration-weighted means: streaming sample-and-hold (TWAP)
state per entity via ``applyInPandasWithState``.

The serving twin of ``operators.windows.time_weighted_mean``: batch TWA
needs each observation's holding interval — i.e. the NEXT observation —
so a naive stream recompute would re-scan history.  Here state per
entity is ``(first_ms, last_ms, last_q, sw, sqw, n)`` — O(1): when a new
observation arrives, the PREVIOUS value's holding interval closes
(``sw += Δt; sqw += last_q·Δt``) and the new value becomes the open
hold.  Every micro-batch emits each touched entity's up-to-date
``(n_obs, span_ms, twa_u)`` snapshot.

All accumulation is in quantized-integer space (python ints — exact,
unbounded), and ``twa_u`` applies the shared truncating-division rule,
so a bounded replay processed as ONE batch reproduces the batch
operator's output EXACTLY (parity-pinned in pytest).

Late data (the O(1)-state contract, mirroring ``streaming.decay``):
an event older than everything seen extends the series START — its
value held from its timestamp to the previous first observation, which
is exactly right since nothing else occupied that span.  An event
INTERIOR to the seen span cannot be retro-inserted into O(1) state; it
is credited zero holding time (counted in ``n_obs`` only) — the
documented approximation, visible only on live streams, never on
ordered replays.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = ("first_ms long, last_ms long, last_q long, sw long, "
                "sqw long, n long")


def _quant(v: float, scale: int) -> int:
    """The shared cross-engine rule (functions.util.quantize) in
    python/numpy form: floor(v·10^scale + 0.5)."""
    return int(np.floor(float(v) * 10.0 ** scale + 0.5))


def _twa_u(sqw: int, sw: int, scale: int, out_scale: int):
    """trunc_div(sqw·10^out, sw·10^scale) — truncation toward zero,
    matching functions.util.trunc_div / DuckDB ``//`` for this repo's
    non-negative denominators."""
    if sw <= 0:
        return None
    num, den = sqw * 10 ** out_scale, sw * 10 ** scale
    q = abs(num) // den
    return q if num >= 0 else -q


def fold_twa(rows, state, scale):
    """Pure per-entity fold shared by the streaming operator and its
    tests.  ``rows``: iterable of (event_id, ms, value); folded in
    (ms, event_id) order.  ``state``: (first_ms, last_ms, last_q, sw,
    sqw, n) or None.  Rows with a null ms or value are SKIPPED (they
    have no place on the hold timeline).  Returns the new state."""
    valid = [(eid, int(t), float(v)) for eid, t, v in rows
             if eid is not None  # a null id TypeErrors the (ms, id)
             # sort on a ts tie — skip, matching null-ms/value semantics
             and t is not None and t == t and v is not None and v == v]
    first_ms, last_ms, last_q, sw, sqw, n = state or (
        None, None, None, 0, 0, 0)
    for eid, t, v in sorted(valid, key=lambda r: (r[1], r[0])):
        q = _quant(v, scale)
        if first_ms is None:
            first_ms = last_ms = t
            last_q = q
        elif t >= last_ms:
            dt = t - last_ms
            sw += dt
            sqw += last_q * dt
            last_ms, last_q = t, q
        elif t < first_ms:  # earlier than all seen: value held t→first
            dt = first_ms - t
            sw += dt
            sqw += q * dt
            first_ms = t
        # else: interior late event — zero holding time, count only
        n += 1
    return first_ms, last_ms, last_q, sw, sqw, n


def _twa_group(key: Tuple[Any, ...], batches: Iterator[pd.DataFrame],
               state: GroupState, scale: int,
               out_scale: int) -> Iterable[pd.DataFrame]:
    (entity,) = key
    rows: list[tuple] = []
    for pdf in batches:
        rows.extend(zip(pdf["event_id"], pdf["ms"], pdf["value"]))
    st = state.get if state.exists else None
    st = fold_twa(rows, st, scale)
    state.update(st)
    first_ms, last_ms, _, sw, sqw, n = st
    if n:
        yield pd.DataFrame(
            [(entity, n, last_ms - first_ms,
              _twa_u(sqw, sw, scale, out_scale))],
            columns=["user_id", "n_obs", "span_ms", "twa_u"])


def streaming_time_weighted_mean(events: DataFrame, scale: int = 6,
                                 out_scale: int = 6,
                                 entity_col: str = "user_id",
                                 id_col: str = "event_id",
                                 ms_col: str = "ms",
                                 value_col: str = "value") -> DataFrame:
    """Streaming DataFrame emitting, per micro-batch, each touched
    entity's up-to-date duration-weighted mean snapshot
    ``(user_id, n_obs, span_ms, twa_u)``.

    ``events`` must be streaming with integer event-time millis in
    ``ms_col``.  State is O(1) per entity and never expires here — a
    production deployment with unbounded entity churn should add a
    processing-time timeout that persists the 6-tuple to a store on
    eviction (the sessionizer's flush pattern).
    """

    def fn(key, batches, state):
        return _twa_group(key, batches, state, int(scale),
                          int(out_scale))

    e_type = events.schema[entity_col].dataType.simpleString()
    out_schema = (f"user_id {e_type}, n_obs long, span_ms long, "
                  f"twa_u long")
    return (events.selectExpr(f"{entity_col} as user_id",
                              f"{id_col} as event_id",
                              f"{ms_col} as ms",
                              f"{value_col} as value")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=STATE_SCHEMA, outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))

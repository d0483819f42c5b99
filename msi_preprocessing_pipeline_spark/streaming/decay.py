"""Online recency-weighted features: streaming exponentially-decayed sums
per entity via ``applyInPandasWithState``.

The serving twin of ``operators.windows.decayed_sum``: state per entity is
just ``(last_ts, acc)`` — O(1), unlike windowed aggregates whose state
holds the window's rows — and every incoming event emits its up-to-date
decayed feature. The fold is the numerically stable recurrence
``acc = acc·exp(-Δt/τ) + v`` (never exponentiates an absolute time, so
there is no span/τ overflow bound at all).

Ordering semantics (the online-serving contract): events are folded in
event-time order WITHIN each micro-batch; an event arriving in a LATER
batch with an older timestamp (late data) cannot be retro-inserted into
an O(1) state, so its value joins the accumulator decayed by its age
against the state's clock (``acc += v·exp(-(last_ts - t)/τ)``) — the
mathematically correct contribution, merely credited late. A bounded
replay processed as one batch is therefore EXACTLY the batch operator
(parity-tested); a live stream differs from a batch recompute only in
when late events' contributions become visible.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_ts long, acc double"


def fold_decay(rows, last_ts, acc, tau):
    """The pure per-entity fold shared by the streaming operator and its
    unit tests: ``rows`` is an iterable of (event_id, ms, value) — folded
    in (ms, event_id) order — against state ``(last_ts, acc)``. Returns
    (emitted [(event_id, ms, decayed)], last_ts, acc). Null values add
    nothing but still emit the current accumulator; rows with a NULL
    timestamp are SKIPPED (they have no place on the decay timeline —
    crashing the whole streaming query over one bad row is worse)."""
    valid = [r for r in rows if r[1] is not None and r[1] == r[1]]
    out = []
    for eid, t, v in sorted(valid, key=lambda r: (r[1], r[0])):
        t = int(t)
        v = 0.0 if v is None or v != v else float(v)
        if last_ts is None:
            acc = v
            last_ts = t
        elif t >= last_ts:
            acc = acc * math.exp(-(t - last_ts) / tau) + v
            last_ts = t
        else:  # late event: its value decayed by its age vs the clock
            acc = acc + v * math.exp(-(last_ts - t) / tau)
        out.append((eid, t, acc))
    return out, last_ts, acc


def _decay_group(key: Tuple[Any, ...],
                 batches: Iterator[pd.DataFrame],
                 state: GroupState,
                 tau: float) -> Iterable[pd.DataFrame]:
    (entity,) = key
    rows: list[tuple] = []
    for pdf in batches:
        rows.extend(zip(pdf["event_id"], pdf["ms"], pdf["value"]))
    if state.exists:
        last_ts, acc = state.get
    else:
        last_ts, acc = None, 0.0
    out, last_ts, acc = fold_decay(rows, last_ts, acc, tau)
    state.update((last_ts, acc))
    if out:
        yield pd.DataFrame(
            [(entity, eid, t, d) for eid, t, d in out],
            columns=["user_id", "event_id", "ms", "decayed"])


def streaming_decayed_sum(events: DataFrame, tau: float,
                          entity_col: str = "user_id",
                          id_col: str = "event_id",
                          ms_col: str = "ms",
                          value_col: str = "value") -> DataFrame:
    """Streaming DataFrame emitting each event's up-to-date decayed sum.

    ``events`` must be streaming with integer event-time millis in
    ``ms_col``. State is O(1) per entity and never expires here — a
    production deployment with unbounded entity churn should wrap the
    fold with a processing-time timeout that persists (entity, last_ts,
    acc) to a store before removal, exactly like the sessionizer's
    timeout flush.
    """

    def fn(key, batches, state):
        return _decay_group(key, batches, state, float(tau))

    # output schema derives the ENTITY and ID types from the input (the
    # column names stay canonical); a string doc id or int32 key works —
    # only the event-time column is pinned to integer millis
    e_type = events.schema[entity_col].dataType.simpleString()
    i_type = events.schema[id_col].dataType.simpleString()
    out_schema = (f"user_id {e_type}, event_id {i_type}, ms long, "
                  f"decayed double")
    return (events.selectExpr(f"{entity_col} as user_id",
                              f"{id_col} as event_id",
                              f"{ms_col} as ms",
                              f"{value_col} as value")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=STATE_SCHEMA, outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))

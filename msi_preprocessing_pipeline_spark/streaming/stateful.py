"""Custom stateful streaming operator: gap sessionization via
``applyInPandasWithState``.

Unlike the built-in ``session_window`` (streaming/sessionize.py), this is the
pattern for ARBITRARY per-entity streaming state: the state struct carries
the open session (start, last event ts, count); each micro-batch folds its
events into the state in event-time order, EMITS every session it closes
(gap exceeded), and keeps the still-open session in the state store. A
processing-time timeout flushes idle entities' open sessions.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id long, session_start long, session_end long, "
                 "n_events long, closed_by string")
STATE_SCHEMA = "start long, last_ts long, n long"


def _sessionize_group(key: Tuple[Any, ...],
                      batches: Iterator[pd.DataFrame],
                      state: GroupState,
                      gap_ms: int,
                      use_timeout: bool) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, last_ts, n = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id, "session_start": start,
                "session_end": last_ts, "n_events": n,
                "closed_by": "timeout",
            }])
        return

    ts_values: list[int] = []
    for pdf in batches:
        ts_values.extend(int(v) for v in pdf["ms"])
    ts_values.sort()

    if state.exists:
        start, last_ts, n = state.get
    else:
        start, last_ts, n = None, None, 0

    closed = []
    for t in ts_values:
        if start is None:
            start, last_ts, n = t, t, 1
        elif t - last_ts > gap_ms:
            closed.append((start, last_ts, n))
            start, last_ts, n = t, t, 1
        else:
            last_ts, n = t, n + 1
    state.update((start, last_ts, n))
    if use_timeout:
        state.setTimeoutDuration(gap_ms)
    if closed:
        yield pd.DataFrame([{
            "user_id": user_id, "session_start": s, "session_end": e,
            "n_events": c, "closed_by": "gap",
        } for s, e, c in closed])


def stateful_sessionize(events: DataFrame, gap_ms: int = 1_800_000,
                        entity_col: str = "user_id", ms_col: str = "ms",
                        idle_timeout: bool = True) -> DataFrame:
    """Streaming DataFrame of CLOSED sessions per entity.

    ``events`` must be streaming with integer event-time millis in
    ``ms_col``. With ``idle_timeout`` (continuous streams) a
    processing-time timeout flushes idle entities' open sessions; disable it
    for bounded replays driven by ``availableNow`` (pending timeouts keep an
    available-now query alive past end-of-data).
    """

    def fn(key, batches, state):
        return _sessionize_group(key, batches, state, gap_ms, idle_timeout)

    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout if idle_timeout
                    else GroupStateTimeout.NoTimeout)
    return (events.selectExpr(f"{entity_col} as user_id",
                              f"{ms_col} as ms")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA, outputMode="append",
                timeoutConf=timeout_conf))

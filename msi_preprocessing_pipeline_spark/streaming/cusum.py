"""Online CUSUM mean-shift monitoring per entity — the streaming twin
of ``operators.drift.cusum_changepoint``.

The batch operator locates a break retrospectively (max |n·prefix −
i·S| over the full history); a live pipeline needs Page's ORIGINAL
sequential test (Page 1954): per entity, with centered value
``d = q − mu_u``, two one-sided recursions

    ``S⁺ = max(0, S⁺ + d − k_u)``    (upward shifts)
    ``S⁻ = max(0, S⁻ − d − k_u)``    (downward shifts)

around the in-control target ``mu_u`` with reference slack ``k_u``; an
alarm fires when either side exceeds ``h_u``, and the fired side resets
to 0 (the standard restart policy).

All state and arithmetic are INTEGER (quantized units): state per
entity is ``(s_pos, s_neg, n)`` — O(1) — and the fold is pure python
ints, so replays are bit-exact and there is no float drift ever.
Events are folded in event-time order WITHIN a micro-batch; across
batches they fold in arrival order against the current state (CUSUM is
inherently order-sensitive — a bounded replay processed as ONE batch is
the canonical ordered run, parity-pinned against the pure fold).

Emits one row per event: ``(user_id, event_id, ms, s_pos, s_neg,
alarm)`` with ``alarm ∈ {0: none, +1: upward, −1: downward}`` (+1 wins
if both cross in the same step).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

import numpy as np

STATE_SCHEMA = "s_pos long, s_neg long, n long"


def _quant(v: float, scale: int) -> int:
    return int(np.floor(float(v) * 10.0 ** scale + 0.5))


def fold_cusum(rows, state, mu_u: int, k_u: int, h_u: int, scale: int):
    """Pure per-entity fold shared by the streaming operator and its
    tests.  ``rows``: iterable of (event_id, ms, value), folded in
    (ms, event_id) order; ``state``: (s_pos, s_neg, n) or None.  Rows
    with a null ms or value are SKIPPED.  Returns (emitted rows,
    new_state); emitted rows are (event_id, ms, s_pos, s_neg, alarm).
    """
    valid = [(eid, int(t), float(v)) for eid, t, v in rows
             if eid is not None  # a null id TypeErrors the (ms, id)
             # sort on a ts tie — skip, matching null-ms/value semantics
             and t is not None and t == t and v is not None and v == v]
    s_pos, s_neg, n = state or (0, 0, 0)
    out = []
    for eid, t, v in sorted(valid, key=lambda r: (r[1], r[0])):
        d = _quant(v, scale) - mu_u
        s_pos = max(0, s_pos + d - k_u)
        s_neg = max(0, s_neg - d - k_u)
        alarm = 0
        if s_pos > h_u:
            alarm, s_pos = 1, 0
        elif s_neg > h_u:
            alarm, s_neg = -1, 0
        n += 1
        out.append((eid, t, s_pos, s_neg, alarm))
    return out, (s_pos, s_neg, n)


def _cusum_group(key: Tuple[Any, ...], batches: Iterator[pd.DataFrame],
                 state: GroupState, mu_u: int, k_u: int, h_u: int,
                 scale: int) -> Iterable[pd.DataFrame]:
    (entity,) = key
    rows: list[tuple] = []
    for pdf in batches:
        rows.extend(zip(pdf["event_id"], pdf["ms"], pdf["value"]))
    st = state.get if state.exists else None
    out, st = fold_cusum(rows, st, mu_u, k_u, h_u, scale)
    state.update(st)
    if out:
        yield pd.DataFrame(
            [(entity, eid, t, sp, sn, al)
             for eid, t, sp, sn, al in out],
            columns=["user_id", "event_id", "ms", "s_pos", "s_neg",
                     "alarm"])


def streaming_cusum(events: DataFrame, mu: float, k: float, h: float,
                    scale: int = 6, entity_col: str = "user_id",
                    id_col: str = "event_id", ms_col: str = "ms",
                    value_col: str = "value") -> DataFrame:
    """Streaming DataFrame emitting each event's two-sided CUSUM state
    and alarm flag.  ``mu``/``k``/``h`` are in VALUE units (quantized
    internally): ``mu`` the in-control mean, ``k`` the reference slack
    (classically δ/2 for a target shift δ), ``h`` the decision
    threshold (classically 4–5 σ).  State is O(1) per entity; see the
    module docstring for the ordering and restart semantics.
    """

    mu_u, k_u, h_u = (_quant(mu, scale), _quant(abs(k), scale),
                      _quant(abs(h), scale))

    def fn(key, batches, state):
        return _cusum_group(key, batches, state, mu_u, k_u, h_u,
                            int(scale))

    e_type = events.schema[entity_col].dataType.simpleString()
    i_type = events.schema[id_col].dataType.simpleString()
    out_schema = (f"user_id {e_type}, event_id {i_type}, ms long, "
                  f"s_pos long, s_neg long, alarm int")
    return (events.selectExpr(f"{entity_col} as user_id",
                              f"{id_col} as event_id",
                              f"{ms_col} as ms",
                              f"{value_col} as value")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, outputStructType=out_schema,
                stateStructType=STATE_SCHEMA, outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))

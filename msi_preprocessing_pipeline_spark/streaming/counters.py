"""Online count encoding: streaming per-category prior-event counters
via ``applyInPandasWithState``.

The serving twin of ``operators.training.count_encode_pit``: state per
category is ONE integer (events seen so far), and every incoming event
emits the count of events that preceded it — the live feature-store
counter.  Ordering semantics match ``streaming.decay``: events fold in
event-time order WITHIN a micro-batch; an event arriving late (in a
later batch) is counted at arrival — an O(1) counter cannot
retro-insert, and a production counter would not either.  A bounded
replay processed as one batch therefore equals the batch operator
exactly (parity-tested).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long"


def fold_counts(rows, n):
    """Pure per-category fold shared with the tests: ``rows`` is an
    iterable of (event_id, ms); events fold in (ms, event_id) order
    against the running count ``n``.  Rows with a NULL timestamp are
    SKIPPED (no place on the event-time line; crashing a streaming
    query over one bad row is worse).  Returns (emitted
    [(event_id, ms, n_prior)], n)."""
    valid = [r for r in rows if r[1] is not None and r[1] == r[1]]
    out = []
    for eid, t in sorted(valid, key=lambda r: (r[1], r[0])):
        out.append((eid, int(t), n))
        n += 1
    return out, n


def _count_group(key: Tuple[Any, ...],
                 batches: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterable[pd.DataFrame]:
    (category,) = key
    rows: list[tuple] = []
    for pdf in batches:
        rows.extend(zip(pdf["event_id"], pdf["ms"]))
    n = state.get[0] if state.exists else 0
    out, n = fold_counts(rows, n)
    state.update((n,))
    if out:
        yield pd.DataFrame(
            [(category, eid, t, c) for eid, t, c in out],
            columns=["category", "event_id", "ms", "n_prior_cat"])


def streaming_count_encode(events: DataFrame,
                           category_col: str = "event_type",
                           id_col: str = "event_id",
                           ms_col: str = "ms") -> DataFrame:
    """Streaming DataFrame emitting each event with the count of prior
    same-category events.  State is one long per category — bounded by
    category cardinality, not rows (for unbounded-churn categories add
    a processing-time timeout that persists counters to a store, like
    the sessionizer's flush)."""
    c_type = events.schema[category_col].dataType.simpleString()
    i_type = events.schema[id_col].dataType.simpleString()
    out_schema = (f"category {c_type}, event_id {i_type}, ms long, "
                  f"n_prior_cat long")
    return (events.selectExpr(f"{category_col} as category",
                              f"{id_col} as event_id",
                              f"{ms_col} as ms")
            .groupBy("category")
            .applyInPandasWithState(
                _count_group, outputStructType=out_schema,
                stateStructType=STATE_SCHEMA, outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))

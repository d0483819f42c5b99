"""Streaming per-group uniform k-sample via ``applyInPandasWithState``.

The streaming counterpart of ``operators.sampling.group_sample_k``: each
group keeps the k items with the SMALLEST md5 draws seen so far — a
bottom-k sketch, the classic mergeable formulation of uniform sampling
without replacement.  Because the state is a pure min-merge over
``(md5(item:seed), item)`` pairs, the final sample is independent of
batch boundaries, arrival order, retries, and replay — a bounded
``availableNow`` replay lands on EXACTLY the rows the batch operator
picks (pytest-pinned parity), which is what lets a *streaming sampler*
carry a deterministic contract at all.

State per group: two parallel arrays (draw hex, item id) of length ≤ k
plus a version counter — O(k) regardless of stream length.  Each
micro-batch that changes a group's sample emits the group's FULL current
sample tagged with the new version; downstream consumers keep each
group's max-version rows (emitting deltas instead would force consumers
to replay the whole history to reconstruct membership).
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("group string, item long, draw string, rank long, "
                 "version long")
STATE_SCHEMA = "draws array<string>, items array<long>, version long"


def bottom_k_merge(pairs: list[tuple[str, int]],
                   new: list[tuple[str, int]], k: int
                   ) -> list[tuple[str, int]]:
    """Min-merge of (draw, item) pairs keeping the k smallest — shared
    by the streaming fold and the tests. Deduplicates exact pairs so a
    replayed item cannot occupy two slots."""
    merged = sorted(set(pairs) | set(new))
    return merged[:k]


def _sample_group(key: Tuple[Any, ...],
                  batches: Iterator[pd.DataFrame],
                  state: GroupState, k: int,
                  seed: int) -> Iterable[pd.DataFrame]:
    (group,) = key
    new = []
    for pdf in batches:
        for item in pdf["item"]:
            if item is None or pd.isna(item):
                continue
            item = int(item)
            h = hashlib.md5(f"{item}:{seed}".encode()).hexdigest()
            new.append((h, item))
    if state.exists:
        draws, items, version = state.get
        cur = list(zip(list(draws), [int(i) for i in items]))
    else:
        cur, version = [], 0
    merged = bottom_k_merge(cur, new, k)
    if merged == cur:
        return
    version += 1
    state.update(([d for d, _ in merged], [i for _, i in merged],
                  version))
    yield pd.DataFrame([{
        "group": group, "item": item, "draw": d, "rank": r + 1,
        "version": version,
    } for r, (d, item) in enumerate(merged)])


def streaming_group_sample(events: DataFrame, k: int,
                           group_col: str = "event_type",
                           item_col: str = "event_id",
                           seed: int = 0) -> DataFrame:
    """Streaming DataFrame of per-group current samples (full snapshot
    per change, tagged with a monotone ``version``; keep max-version
    rows per group downstream)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def fn(key, batches, state):
        return _sample_group(key, batches, state, k, seed)

    return (events.selectExpr(f"cast({group_col} as string) as group",
                              f"cast({item_col} as long) as item")
            .groupBy("group")
            .applyInPandasWithState(
                fn, outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA, outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))

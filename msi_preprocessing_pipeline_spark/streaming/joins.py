"""Stream-stream interval join — continuous click-to-purchase style
attribution.

The streaming counterpart of ``operators.joins.range_join`` /
``operators.asof``: match each left-side event with the right-side
events of the same key whose event time falls in a bounded lookback
window before it.  Both sides carry watermarks and the join condition
carries the time range, which is exactly what lets Spark bound the
join STATE: a buffered right row can be evicted once the left
watermark passes ``right_ts + lookback``, and vice versa — without
the range condition the state store would grow forever.

At cluster scale the state shards by join key across executors (the
same key-partitioned state mechanics as the stateful sessionizer);
throughput scales with executors, and a skewed key concentrates state
exactly like a skewed groupBy — salt upstream if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(left: DataFrame, right: DataFrame, on: str,
                         left_ts: str = "ts", right_ts: str = "ts",
                         lookback: str = "1 hour",
                         watermark: str = "2 hours",
                         right_prefix: str = "r_",
                         how: str = "inner") -> DataFrame:
    """Join ``left`` rows to same-``on``-key ``right`` rows with
    ``right_ts`` in ``[left_ts - lookback, left_ts]`` (inclusive — the
    instantaneously-co-timed event matches).  Right-side columns other
    than the key are prefixed with ``right_prefix`` so the output
    schema is collision-free; the right event-time column keeps its
    prefix too (``{right_prefix}{right_ts}``).

    ``how`` may be ``inner`` or ``leftOuter`` (outer emission waits for
    the watermark, as Spark defines).  Both inputs must be streaming
    DataFrames with event-time columns castable to timestamp; pass the
    same ``watermark`` horizon you can tolerate for late data — it
    bounds both state stores.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner or leftOuter, got {how!r}")
    lt, rt = f"__l_{left_ts}", f"{right_prefix}{right_ts}"
    l = (left.withColumn(lt, F.col(left_ts).cast("timestamp"))
         .withWatermark(lt, watermark))
    r = right
    for c in r.columns:
        if c != on:
            r = r.withColumnRenamed(c, f"{right_prefix}{c}")
    r = (r.withColumn(rt, F.col(rt).cast("timestamp"))
         .withWatermark(rt, watermark))
    cond = ((l[on] == r[on])
            & (r[rt] >= l[lt] - F.expr(f"interval {lookback}"))
            & (r[rt] <= l[lt]))
    # drop the right key copy AFTER the join (dropping it before would
    # orphan the r[on] attribute the condition references)
    return (l.join(r, cond, how)
            .drop(r[on])
            .drop(lt))

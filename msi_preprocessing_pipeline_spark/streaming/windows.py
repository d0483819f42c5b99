"""Watermarked tumbling/sliding window aggregations for streams.

The streaming counterpart of the batch rolling/window operators: event-time
windows with a watermark bounding how late a row may arrive. In append mode
a window only emits once the watermark passes its end — late rows beyond
the watermark are DROPPED (tested), which is the bounded-state contract
that lets the aggregation run forever at 10^12-row scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_windowed_agg(events: DataFrame, entity_col: str = "user_id",
                           ts_col: str = "ts", value_col: str = "value",
                           window: str = "10 minutes",
                           slide: str | None = None,
                           watermark: str = "30 minutes") -> DataFrame:
    """Per-(entity, window) count + sum with an event-time watermark.

    ``slide=None`` → tumbling windows; otherwise sliding (each event lands
    in window/slide overlapping windows)."""
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(win.alias("win"), F.col(entity_col))
            .agg(F.count("*").alias("n_events"),
                 F.sum(value_col).alias("value_sum"))
            .select(entity_col,
                    F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "n_events", "value_sum"))

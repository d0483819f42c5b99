"""Streaming sessionization with watermarked gap windows.

The batch analog is ``operators.windows.sessionize`` (lag + running sum);
streaming uses the built-in ``session_window`` (state-store backed, merges
on gap overlap) with a watermark bounding late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(events: DataFrame, entity_col: str = "user_id",
                            ts_col: str = "ts", gap: str = "30 minutes",
                            watermark: str = "1 hour") -> DataFrame:
    """One output row per closed session: entity, window, event count, value
    sum. ``events`` must be a streaming DataFrame with an event-time column.
    """
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("session"),
                     F.col(entity_col))
            .agg(F.count("*").alias("n_events"))
            .select(entity_col,
                    F.col("session.start").alias("session_start"),
                    F.col("session.end").alias("session_end"),
                    "n_events"))


def run_to_memory(stream_df: DataFrame, query_name: str):
    """Drive a streaming aggregation over a bounded source to completion into
    an in-memory table (local test/smoke harness)."""
    q = (stream_df.writeStream.outputMode("complete")
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    q.stop()
    return q

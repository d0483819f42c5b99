"""Streaming ingest deduplication — the continuous counterpart of
``operators.dedup.dedup_exact`` for a document firehose.

Exact content dedup at ingest: fingerprint each arriving document (md5 of
the lowercase whitespace-collapsed text — same normalization as
``operators.text.fingerprint``) and keep only the FIRST arrival per
fingerprint within the watermark horizon. State is bounded by the
watermark: ``dropDuplicatesWithinWatermark`` evicts a fingerprint once the
event-time watermark passes its last-seen timestamp + delay, which is what
lets the operator run forever — an unbounded ``dropDuplicates`` would
accumulate one state row per distinct document ever seen.

At cluster scale the state store shards by fingerprint hash across
executors (the same key-partitioned state mechanics as the stateful
sessionizer), so throughput scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_exact(docs: DataFrame, text_col: str = "text",
                          ts_col: str = "ts",
                          watermark: str = "30 minutes") -> DataFrame:
    """Keep the first arrival per content fingerprint within the watermark
    horizon. ``docs`` must be a streaming DataFrame carrying an event-time
    ``ts_col``. Output: the surviving rows plus their ``fingerprint``."""
    normalized = F.regexp_replace(
        F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    with_fp = (docs
               .withColumn("fingerprint", F.md5(normalized.cast("binary")))
               .withWatermark(ts_col, watermark))
    return with_fp.dropDuplicatesWithinWatermark(["fingerprint"])

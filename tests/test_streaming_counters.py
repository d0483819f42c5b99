"""Streaming count-encoder serving vs the batch operator, plus the pure
fold's ordering/late-event semantics."""

import os
import shutil

from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.training import (
    count_encode_pit)
from msi_preprocessing_pipeline_spark.streaming.counters import (
    fold_counts, streaming_count_encode)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_counts_match_batch_on_bounded_replay(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    os.makedirs(ev_dir)
    shutil.copy(f"{SF_DIR}/events.parquet", f"{ev_dir}/part-0.parquet")
    raw = spark.read.parquet(ev_dir)
    batch_ev = raw.select(
        "event_id", "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"))

    stream = (spark.readStream.schema(raw.schema).parquet(ev_dir)
              .select("event_id", "event_type",
                      F.unix_millis(F.col("ts").cast("timestamp"))
                      .alias("ms")))
    out = streaming_count_encode(stream, "event_type")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("count_stream").trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    got = {r["event_id"]: r["n_prior_cat"]
           for r in spark.sql("select * from count_stream").collect()}

    exp = count_encode_pit(batch_ev, "event_type", "ms",
                           tiebreak=["event_id"]).collect()
    assert len(got) == len(exp) > 500
    for r in exp:
        assert got[r["event_id"]] == r["ce_event_type"], r["event_id"]


def test_fold_counts_orders_within_batch_and_carries_state():
    out, n = fold_counts([(2, 100), (1, 50), (3, 100)], 0)
    # event-time order with id tiebreak: 1@50 -> 0, 2@100 -> 1, 3@100 -> 2
    assert out == [(1, 50, 0), (2, 100, 1), (3, 100, 2)]
    assert n == 3
    # a later batch continues from the carried count, even for a LATE
    # event (counted at arrival — an O(1) counter cannot retro-insert)
    out2, n2 = fold_counts([(4, 10)], n)
    assert out2 == [(4, 10, 3)] and n2 == 4


def test_fold_counts_skips_null_timestamp_rows():
    out, n = fold_counts([(1, 0), (2, None), (3, float("nan"))], 0)
    assert out == [(1, 0, 0)] and n == 1

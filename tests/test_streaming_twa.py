"""Streaming time-weighted mean vs the batch operator (exact-integer
parity on a bounded replay), plus the pure fold's late-event
semantics."""

import os
import shutil

from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.windows import (
    time_weighted_mean)
from msi_preprocessing_pipeline_spark.streaming.twa import (
    fold_twa, streaming_time_weighted_mean)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_twa_matches_batch_on_bounded_replay(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    os.makedirs(ev_dir)
    shutil.copy(f"{SF_DIR}/events.parquet", f"{ev_dir}/part-0.parquet")
    raw = spark.read.parquet(ev_dir)
    batch_ev = raw.select(
        "event_id", "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"), "value")

    stream = (spark.readStream.schema(raw.schema).parquet(ev_dir)
              .select("event_id", "user_id",
                      F.unix_millis(F.col("ts").cast("timestamp"))
                      .alias("ms"), "value"))
    out = streaming_time_weighted_mean(stream)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("twa_stream").trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    got = {r["user_id"]: (r["n_obs"], r["span_ms"], r["twa_u"])
           for r in spark.sql("select * from twa_stream").collect()}

    exp = {r["user_id"]: (r["n_obs"], r["span_ms"], r["twa_u"])
           for r in time_weighted_mean(
               batch_ev, "value", "user_id", "ms",
               tiebreak=["event_id"]).collect()}
    assert len(got) == len(exp) > 10
    assert got == exp  # exact-integer parity, not approx


def test_fold_twa_basic_and_single():
    st = fold_twa([(1, 0, 10.0), (2, 2, 20.0), (3, 10, 99.0)],
                  None, scale=6)
    first, last, last_q, sw, sqw, n = st
    assert (first, last, n) == (0, 10, 3)
    assert sw == 10 and sqw == 10_000_000 * 2 + 20_000_000 * 8
    assert fold_twa([(1, 5, 7.5)], None, 6)[3] == 0  # single obs: sw 0


def test_fold_twa_late_events():
    st = fold_twa([(1, 100, 10.0), (2, 200, 20.0)], None, scale=6)
    # earlier-than-all late event: holds from its ts to the old start
    st2 = fold_twa([(3, 40, 5.0)], st, scale=6)
    assert st2[0] == 40                       # first_ms extended
    assert st2[3] == 160                      # sw: 100 + 60
    assert st2[4] == 10_000_000 * 100 + 5_000_000 * 60
    # interior late event: zero holding time, counted only
    st3 = fold_twa([(4, 150, 77.0)], st2, scale=6)
    assert st3[3] == st2[3] and st3[4] == st2[4] and st3[5] == 4


def test_fold_twa_skips_null_rows():
    st = fold_twa([(1, None, 1.0), (2, 5, None), (3, 5, 2.0),
                   (4, float("nan"), 3.0)], None, scale=6)
    assert st[5] == 1 and st[0] == 5

"""Streaming decayed-sum serving vs the batch operator, plus the pure
fold's late-event semantics."""

import math
import os
import shutil

import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.windows import decayed_sum
from msi_preprocessing_pipeline_spark.streaming.decay import (
    fold_decay, streaming_decayed_sum)

SF_DIR = "/root/testdata/sf0.001"
TAU = 86_400_000.0


def test_streaming_decay_matches_batch_on_bounded_replay(spark, tmp_path):
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
    out = streaming_decayed_sum(stream, tau=TAU)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("decayed_stream").trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    got = {r["event_id"]: r["decayed"]
           for r in spark.sql("select * from decayed_stream").collect()}

    exp_rows = decayed_sum(batch_ev, "value", "user_id", ts_col="ms",
                           tau=TAU, strategy="scan",
                           include_current=True,
                           tiebreak=["event_id"]).collect()
    assert len(got) == len(exp_rows) > 500
    for r in exp_rows:
        e = r["value_decayed"]
        g = got[r["event_id"]]
        if e is None:
            # batch emits null for all-null history; streaming emits the
            # running accumulator (0.0) — no null values in this table
            assert g == pytest.approx(0.0)
        else:
            assert g == pytest.approx(e, rel=1e-9), r["event_id"]


def test_fold_decay_late_event_contributes_decayed_by_age():
    # in-order prefix: t=0 (v=10), t=100 (v=20) with tau=100
    out, last, acc = fold_decay([(1, 0, 10.0), (2, 100, 20.0)],
                                None, 0.0, 100.0)
    assert last == 100
    assert acc == pytest.approx(20.0 + 10.0 * math.exp(-1.0))
    # LATE event at t=50 (v=5): joins decayed by (100-50)/100, clock keeps
    out2, last2, acc2 = fold_decay([(3, 50, 5.0)], last, acc, 100.0)
    assert last2 == 100
    assert acc2 == pytest.approx(acc + 5.0 * math.exp(-0.5))
    assert out2 == [(3, 50, pytest.approx(acc2))]


def test_fold_decay_null_value_emits_current_acc():
    out, last, acc = fold_decay([(1, 0, 7.0), (2, 10, None)],
                                None, 0.0, 100.0)
    assert acc == pytest.approx(7.0 * math.exp(-0.1))
    assert out[1][2] == pytest.approx(acc)


def test_fold_decay_skips_null_timestamp_rows():
    out, last, acc = fold_decay(
        [(1, 0, 10.0), (2, None, 99.0), (3, float("nan"), 5.0)],
        None, 0.0, 100.0)
    assert [o[0] for o in out] == [1]
    assert acc == pytest.approx(10.0)


def test_streaming_decay_string_entity_and_int_id(spark, tmp_path):
    """Output schema derives entity/id types from the input."""
    import os
    ev_dir = str(tmp_path / "ev")
    os.makedirs(ev_dir)
    spark.createDataFrame(
        [("a", 1, 0, 10.0), ("a", 2, 100, 20.0), ("b", 3, 0, 5.0)],
        "k string, eid int, ms long, value double") \
        .write.parquet(ev_dir, mode="overwrite")
    raw = spark.read.parquet(ev_dir)
    stream = spark.readStream.schema(raw.schema).parquet(ev_dir)
    out = streaming_decayed_sum(stream, tau=100.0, entity_col="k",
                                id_col="eid")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("decay_str").trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    got = {(r["user_id"], r["event_id"]): r["decayed"]
           for r in spark.sql("select * from decay_str").collect()}
    assert got[("a", 2)] == pytest.approx(20.0 + 10.0 * math.exp(-1.0))
    assert got[("b", 3)] == pytest.approx(5.0)

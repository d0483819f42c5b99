"""Streaming drift monitor vs the batch PSI operator."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.drift import psi_drift
from msi_preprocessing_pipeline_spark.streaming.monitor import (
    psi_of_batch, reference_shares, streaming_bin_counts)

SF_DIR = "/root/testdata/sf0.001"
LO, HI, NB = 0.0, 400.0, 10


def test_streaming_psi_matches_batch_operator(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    os.makedirs(ev_dir)
    shutil.copy(f"{SF_DIR}/events.parquet", f"{ev_dir}/part-0.parquet")
    raw = spark.read.parquet(ev_dir)

    ref = raw.where(F.col("event_type") == "click")
    shares = reference_shares(ref, "value", LO, HI, NB)
    assert len(shares) == NB and abs(sum(p for _, p in shares) - 1) < 1e-9

    stream = spark.readStream.schema(raw.schema).parquet(ev_dir)
    counts = streaming_bin_counts(stream, "value", LO, HI, NB,
                                  ts_col="ts", window="7 days",
                                  watermark="1 hour")
    q = (counts.writeStream.outputMode("append").format("memory")
         .queryName("bin_counts").trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    emitted = spark.sql("select * from bin_counts")
    assert emitted.count() > 0

    psi = {(r["window_start"], r["window_end"]): r["psi"]
           for r in psi_of_batch(emitted, shares, NB).collect()}
    assert len(psi) >= 3  # a month of data in 7-day tumbling windows

    for (ws, we), got in psi.items():
        cur = raw.where((F.col("ts") >= F.lit(ws)) & (F.col("ts") < F.lit(we)))
        exp = psi_drift(ref, cur, "value", LO, HI, NB) \
            .agg(F.sum("psi_contrib")).collect()[0][0]
        assert got == pytest.approx(exp, rel=1e-9), (ws, we)


def test_streaming_psi_empty_bins_penalized(spark):
    """A window whose data misses bins entirely still gets the smoothed
    zero share (not dropped) — PSI must see mass disappearing."""
    ref_rows = [(float(v),) for v in range(0, 400, 4)]
    ref = spark.createDataFrame(ref_rows, "value double")
    shares = reference_shares(ref, "value", LO, HI, NB)
    batch = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-08 00:00:00", 0, 100)],
        "window_start string, window_end string, bin int, n long")
    [row] = psi_of_batch(batch, shares, NB).collect()
    # all current mass in bin 0 vs uniform reference -> large PSI
    assert row["psi"] > 1.0
    assert row["n_events"] == 100

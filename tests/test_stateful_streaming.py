"""Custom stateful streaming sessionizer vs the batch sessionizer.

The stateful operator emits CLOSED sessions; with a bounded stream the last
session of each entity stays open (in the state store), so the comparison is
against every batch session that has a successor.
"""

import os
import shutil

from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.windows import session_stats
from msi_preprocessing_pipeline_spark.streaming.stateful import (
    stateful_sessionize)

SF_DIR = "/root/testdata/sf0.001"
GAP_MS = 1_800_000


def test_stateful_sessionize_matches_batch_closed_sessions(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    os.makedirs(ev_dir)
    shutil.copy(f"{SF_DIR}/events.parquet", f"{ev_dir}/part-0.parquet")
    raw = spark.read.parquet(ev_dir)
    batch_ev = raw.select(
        "user_id", "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"))

    stream = (spark.readStream.schema(raw.schema).parquet(ev_dir)
              .select("user_id",
                      F.unix_millis(F.col("ts").cast("timestamp")).alias("ms")))
    out = stateful_sessionize(stream, gap_ms=GAP_MS, idle_timeout=False)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("closed_sessions").trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql("select * from closed_sessions").toPandas()
    assert (got["closed_by"] == "gap").all()

    batch = session_stats(batch_ev, "user_id", ts_col="ms",
                          gap_seconds=float(GAP_MS),
                          tiebreak=["event_id"]).toPandas()
    # closed = every session except each user's last
    last_per_user = batch.groupby("user_id")["session_id"].transform("max")
    closed_exp = batch[batch.session_id != last_per_user]

    key = ["user_id", "session_start", "session_end", "n_events"]
    got_set = {tuple(r) for r in got[key].itertuples(index=False)}
    exp_set = {tuple(r) for r in closed_exp.rename(
        columns={})[["user_id", "session_start", "session_end",
                     "n_events"]].itertuples(index=False)}
    assert got_set == exp_set
    assert len(got_set) > 50  # meaningful coverage

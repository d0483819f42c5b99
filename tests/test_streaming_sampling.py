"""Streaming bottom-k group sampler: bounded-replay parity with the
batch group_sample_k, merge purity, version monotonicity."""
import os
import shutil

from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.sampling import (
    group_sample_k)
from msi_preprocessing_pipeline_spark.streaming.sampling import (
    bottom_k_merge, streaming_group_sample)

SF_DIR = "/root/testdata/sf0.001"


def test_merge_is_order_and_batching_independent():
    import hashlib
    pairs = [(hashlib.md5(f"{i}:0".encode()).hexdigest(), i)
             for i in range(40)]
    one_shot = bottom_k_merge([], pairs, 5)
    acc = []
    for i in range(0, 40, 7):  # uneven batches, reversed order inside
        acc = bottom_k_merge(acc, list(reversed(pairs[i:i + 7])), 5)
    assert acc == one_shot
    # replaying a batch (duplicates) changes nothing
    assert bottom_k_merge(acc, pairs[:10], 5) == one_shot


def test_streaming_sample_matches_batch_operator(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    os.makedirs(ev_dir)
    shutil.copy(f"{SF_DIR}/events.parquet", f"{ev_dir}/part-0.parquet")
    raw = spark.read.parquet(ev_dir)

    stream = spark.readStream.schema(raw.schema).parquet(
        ev_dir).select("event_type", "event_id")
    out = streaming_group_sample(stream, k=7, seed=3)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("sample_stream").trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from sample_stream").collect()
    latest_v = {}
    for r in rows:
        latest_v[r["group"]] = max(latest_v.get(r["group"], 0),
                                   r["version"])
    got = {(r["group"], r["item"]) for r in rows
           if r["version"] == latest_v[r["group"]]}

    exp_rows = group_sample_k(
        raw.select(F.col("event_type").cast("string").alias("group"),
                   F.col("event_id").cast("long").alias("item")),
        "item", "group", 7, seed=3).collect()
    exp = {(r["group"], r["item"]) for r in exp_rows}
    assert got == exp and len(exp) > 10

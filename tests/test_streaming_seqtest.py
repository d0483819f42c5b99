"""streaming.seqtest.seq_ab_landing: availableNow replay reproduces the
batch sequential_ab decision table exactly, and committed-retry replay
is safe (the conformal_landing contract)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.experiment import (
    sequential_ab)
from msi_preprocessing_pipeline_spark.streaming.seqtest import (
    seq_ab_landing)


def _mk_df(spark, seed=7, n=600, looks=5):
    import random
    rng = random.Random(seed)
    rows = [(i, rng.randrange(0, 2), i % looks,
             round(rng.gauss(5.0, 1.0) + 0.6 * (i % 2), 3))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "id long, treat int, look int, value double")


def _two_batch_stream(spark, tmp_path, df):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    half = df.count() // 2
    df.limit(half).coalesce(1).write.parquet(str(tmp_path / "w0"))
    df.subtract(df.limit(half)).coalesce(1) \
        .write.parquet(str(tmp_path / "w1"))
    for i in (0, 1):
        src = [f for f in os.listdir(str(tmp_path / f"w{i}"))
               if f.endswith(".parquet")][0]
        shutil.copy(str(tmp_path / f"w{i}" / src),
                    f"{in_dir}/b{i}.parquet")
    return (spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1).parquet(in_dir))


def test_streaming_seq_ab_batch_parity(spark, tmp_path):
    df = _mk_df(spark).cache()
    store = str(tmp_path / "store")
    dlog = str(tmp_path / "decisions")
    q = (_two_batch_stream(spark, tmp_path, df).writeStream
         .foreachBatch(seq_ab_landing(store, dlog, treat_col="treat",
                                      outcome_col="value",
                                      look_col="look", alpha=0.05))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    log = spark.read.parquet(dlog)
    assert log.select("batch_id").distinct().count() == 2
    final = [tuple(r)[:-1] for r in
             log.where("batch_id = 1").orderBy("look").collect()]
    exp = [tuple(r) for r in
           sequential_ab(df, "treat", "value", "look",
                         alpha=0.05).collect()]
    # exact parity including z_q6: the merged moments are the identical
    # exact decimals, so the fixed-order doubles match bit-for-bit
    assert final == exp
    # interim decisions from batch 0 cover only batch 0's rows
    b0 = [r for r in log.where("batch_id = 0").collect()]
    assert sum(r.cum_n_t + r.cum_n_c for r in b0 if r.k == r.n_looks) \
        == 300


def test_streaming_seq_ab_retry_replay_safe(spark, tmp_path):
    df = _mk_df(spark, seed=8, n=400, looks=4).cache()
    b0 = df.limit(200)
    b1 = df.subtract(b0)
    store = str(tmp_path / "store")
    dlog = str(tmp_path / "decisions")
    land = seq_ab_landing(store, dlog, treat_col="treat",
                          outcome_col="value", look_col="look")
    land(b0, 0)
    land(b1, 1)
    first = sorted(tuple(r) for r in
                   spark.read.parquet(dlog)
                   .where("batch_id = 1").collect())
    land(b1, 1)  # retry after commit: re-reads v0, never its own output
    again = spark.read.parquet(dlog).where("batch_id = 1").collect()
    assert len(again) == 2 * len(first)
    assert sorted(tuple(r) for r in again) == \
        sorted(first + first)
    merged = spark.read.parquet(f"{store}/v1")
    total = merged.agg((F.sum("n_t") + F.sum("n_c")).cast("long")
                       .alias("n")).collect()[0].n
    assert total == 400  # no double count

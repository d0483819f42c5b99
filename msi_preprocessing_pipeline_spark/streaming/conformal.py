"""Online split-conformal calibration — the streaming twin of
``operators.experiment.conformal_qhat``.

A served model's nonconformity scores arrive continuously; the
calibration quantile q̂ must track them without re-scanning history.
Structured Streaming's single-aggregation limit makes the standard split
(the PSI-monitor / near-dup-store shape): a ``foreachBatch`` landing step
maintains a VERSIONED quantized-score histogram store — per batch, merge
the micro-batch's |distinct-in-batch|-bounded counts into the prior
snapshot (an additive, commutative merge, so arrival order never matters)
— and recomputes q̂ from the merged histogram with the SAME
``qhat_from_counts`` rank selection the batch operator uses.  The store
is bounded by |distinct quantized scores| (choose ``scale`` accordingly:
at scale 3 a [0, 1000] score domain is ≤ 10⁶ rows), not by rows ingested.

Replay safety follows ``streaming.dedup.near_dup_landing`` verbatim: the
prior is the newest snapshot STRICTLY below the current ``batch_id`` (a
retry whose snapshot committed re-reads the same prior, never its own
output), the consumed snapshot survives until superseded, and the q̂ log
is append-only stamped with ``batch_id`` (retries re-append identical
rows; exactly-once consumers dedup on ``batch_id``).

Parity contract (pytest-pinned): after an ``availableNow`` replay of a
corpus, the final snapshot's histogram equals the batch operator's
distinct-count relation and the last q̂ row equals
``conformal_qhat(corpus)`` exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.util import quantize
from ..operators.experiment import qhat_from_counts


def conformal_landing(store_path: str, qhat_path: str,
                      score_col: str = "score", alpha: float = 0.1,
                      scale: int = 6):
    """``foreachBatch`` landing step.  Wiring::

        (scores_stream.writeStream
         .foreachBatch(conformal_landing(store, qhat_log))
         .option("checkpointLocation", ckpt).start())
    """

    def land(batch: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch.sparkSession
        counts = (batch.where(F.col(score_col).isNotNull())
                  .groupBy(quantize(F.col(score_col), scale)
                           .alias("s_u"))
                  .agg(F.count("*").alias("c")))
        versions = []
        if os.path.isdir(store_path):
            # STRICTLY below batch_id — see module docstring
            versions = sorted(
                v for v in (int(d[1:]) for d in os.listdir(store_path)
                            if d.startswith("v") and d[1:].isdigit())
                if v < int(batch_id))
        if versions:
            prior = spark.read.parquet(f"{store_path}/v{versions[-1]}")
            merged = (prior.unionByName(counts)
                      .groupBy("s_u").agg(F.sum("c").alias("c")))
        else:
            merged = counts
        merged.write.mode("overwrite") \
            .parquet(f"{store_path}/v{batch_id}")
        hist = spark.read.parquet(f"{store_path}/v{batch_id}")
        (qhat_from_counts(hist, alpha)
         .withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("append").parquet(qhat_path))
        for v in versions[:-1]:
            shutil.rmtree(f"{store_path}/v{v}", ignore_errors=True)

    return land

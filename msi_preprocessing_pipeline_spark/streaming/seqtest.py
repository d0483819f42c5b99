"""Online group-sequential A/B monitoring — the streaming twin of
``operators.experiment.sequential_ab``.

Experiment events arrive continuously; the interim decision table
(Welch z per look vs the O'Brien-Fleming boundary) must track them
without re-scanning history.  The per-look moment relation
(``seq_ab_moments``) is ADDITIVE and COMMUTATIVE — n / Σy / Σy² per
(look, arm) merge by summation — so the standard versioned-store split
applies (the conformal/PSI/near-dup landing shape): per micro-batch,
aggregate the batch to its per-look moments, sum-merge into the prior
snapshot, and recompute the decision table from the merged store with
the SAME ``seq_ab_decisions`` the batch operator uses.  The store is
bounded by |looks| × 7 columns — days of an experiment, never rows.

Replay safety is ``conformal.conformal_landing`` verbatim: prior =
newest snapshot STRICTLY below the current ``batch_id`` (a committed
retry re-reads the same prior, never its own output), the consumed
snapshot survives until superseded, and the decision log is append-only
stamped with ``batch_id``.

Parity contract (pytest-pinned): after an ``availableNow`` replay of a
corpus, the final snapshot's decision table equals
``sequential_ab(corpus)`` exactly — including the z_q6 integers, since
the merged moments are the identical exact decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.experiment import seq_ab_decisions, seq_ab_moments


def seq_ab_landing(store_path: str, decisions_path: str,
                   treat_col: str = "treat", outcome_col: str = "value",
                   look_col: str = "look", alpha: float = 0.05,
                   scale: int = 6):
    """``foreachBatch`` landing step.  Wiring::

        (events_stream.writeStream
         .foreachBatch(seq_ab_landing(store, decisions_log))
         .option("checkpointLocation", ckpt).start())
    """

    def land(batch: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch.sparkSession
        moments = seq_ab_moments(batch, treat_col, outcome_col,
                                 look_col, scale=scale)
        versions = []
        if os.path.isdir(store_path):
            versions = sorted(
                v for v in (int(d[1:]) for d in os.listdir(store_path)
                            if d.startswith("v") and d[1:].isdigit())
                if v < int(batch_id))
        if versions:
            prior = spark.read.parquet(f"{store_path}/v{versions[-1]}")
            merged = (prior.unionByName(moments)
                      .groupBy("look")
                      .agg(*[F.sum(c).alias(c)
                             for c in ("n_t", "n_c", "sy_t", "sy_c",
                                       "syy_t", "syy_c")]))
        else:
            merged = moments
        merged.write.mode("overwrite") \
            .parquet(f"{store_path}/v{batch_id}")
        store = spark.read.parquet(f"{store_path}/v{batch_id}")
        (seq_ab_decisions(store, alpha=alpha)
         .withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("append").parquet(decisions_path))
        for v in versions[:-1]:
            shutil.rmtree(f"{store_path}/v{v}", ignore_errors=True)

    return land

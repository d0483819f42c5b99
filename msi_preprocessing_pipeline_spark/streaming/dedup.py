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


def near_dup_landing(store_path: str, pairs_path: str,
                     text_col: str = "text", id_col: str = "doc_id",
                     n_hashes: int = 64, shingle_words: int = 3,
                     seed: int = 7, bands: int = 16,
                     threshold: float = 0.5,
                     star_over: int | None = None):
    """Continuous NEAR-dup detection: a ``foreachBatch`` landing step that
    maintains the MinHash signature store across micro-batches and appends
    each batch's verified new pairs — the streaming deployment of
    ``operators.dedup.incremental_minhash_pairs``.

    Wiring::

        (docs_stream.writeStream
         .foreachBatch(near_dup_landing(store, pairs))
         .option("checkpointLocation", ckpt).start())

    The store is written as VERSIONED snapshots ``{store_path}/v{batch_id}``
    (never in place — the update reads the previous version lazily while
    writing the next, and an in-place overwrite would corrupt the read).
    The prior is always the newest version STRICTLY below ``batch_id`` —
    a retry of a batch whose snapshot already committed re-reads the same
    prior instead of its own output — and that consumed snapshot is
    retained until the next batch supersedes it (steady state: two
    snapshots on disk); everything older is pruned. Pairs land
    under ``pairs_path`` stamped with ``batch_id``: on a micro-batch RETRY
    the same batch_id is appended twice, so exactly-once consumers dedup
    on ``(batch_id, doc_a, doc_b)`` — the values are deterministic, so
    duplicates are identical.

    Parity contract (pytest-pinned): the union of pairs across batches
    equals the one-shot ``minhash_lsh_pairs`` over everything ingested —
    pair (a, b) is emitted exactly when its LATER member arrives.
    """
    from ..operators.dedup import incremental_minhash_pairs

    def land(batch: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch.sparkSession
        versions = []
        if os.path.isdir(store_path):
            # STRICTLY below batch_id: on a micro-batch retry after the
            # store write committed but before the checkpoint did,
            # v{batch_id} already exists — reading it as prior would make
            # the overwrite read its own input (Spark refuses), and
            # pruning it would destroy the snapshot just written
            versions = sorted(
                v for v in (int(d[1:]) for d in os.listdir(store_path)
                            if d.startswith("v") and d[1:].isdigit())
                if v < int(batch_id))
        if versions:
            prior = spark.read.parquet(f"{store_path}/v{versions[-1]}")
        else:
            id_type = batch.schema[id_col].dataType.simpleString()
            prior = spark.createDataFrame(
                [], f"{id_col} {id_type}, signature array<bigint>")
        all_sigs, pairs = incremental_minhash_pairs(
            batch, prior, text_col=text_col, id_col=id_col,
            n_hashes=n_hashes, shingle_words=shingle_words, seed=seed,
            bands=bands, threshold=threshold, star_over=star_over)
        (pairs.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("append").parquet(pairs_path))
        all_sigs.write.mode("overwrite") \
            .parquet(f"{store_path}/v{batch_id}")
        # prune all but the snapshot this batch consumed: a RETRY of this
        # batch must re-read the same prior, so the newest version below
        # batch_id stays until the NEXT batch supersedes it (steady state
        # is two snapshots on disk)
        for v in versions[:-1]:
            shutil.rmtree(f"{store_path}/v{v}", ignore_errors=True)

    return land

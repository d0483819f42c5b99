"""Training-shard layout planning: size-balanced deterministic sharding.

A training run reads the corpus as S shards (files, tasks, data-loader
workers); if shard token totals are unbalanced the slowest shard gates the
epoch.  ``plan_shards`` assigns every document to a shard with the
boustrophedon ("snake") rule over the global size rank — documents sorted
by size descending, dealt to shards left-to-right then right-to-left in
alternating blocks of S — a classic one-pass approximation of
longest-processing-time scheduling: each block of S contributes one doc
per shard, and the direction flip cancels the within-block size gradient
(shard totals differ by at most max_size − min_size over any prefix of
blocks, vs O(blocks·gradient) for naive round-robin).

The global rank is computed DISTRIBUTED (the ``exact_quantiles`` big-path
machinery, factored out as :func:`global_rank`): one range exchange
(``sort``), a |partitions|-row count collect, a broadcast offset join, and
a ``row_number`` window partitioned by ``spark_partition_id()`` — never a
single-partition window over corpus rows.

Determinism: rank order is (size desc, id asc) — a total order — so the
assignment is partition-, engine-, and rerun-invariant, and the DuckDB
oracle mirrors it as one ``row_number`` + the same integer snake formula.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_by: list[Column],
                out_col: str = "rank",
                with_total: bool = False):
    """Exact 0-based global rank of every row under ``order_by`` (must be
    a total order for determinism), computed without a single-partition
    window: range-sort → per-sorted-partition counts (|partitions| rows,
    collected) → broadcast offset join → per-partition ``row_number``.
    Adds ``out_col``; preserves all input columns.  With
    ``with_total=True`` returns ``(df, n_rows)`` — the total is already
    known from the offsets collect, so callers that need it (e.g.
    ``experiment.uplift_curve``'s bucket edges) avoid a second corpus
    scan."""
    # localCheckpoint freezes the range partitioning: the offsets job and
    # the returned plan MUST see identical spark_partition_id values (a
    # re-run of the sort could repartition under AQE), and the checkpoint
    # is also the cheaper plan — ONE materialized sort feeds both jobs
    # instead of two sorts.  Storage is freed when the RDD is GC'd, so no
    # persist/unpersist bookkeeping leaks across the returned lineage.
    sorted_df = (df.sort(*order_by)
                 .withColumn("__pid", F.spark_partition_id())
                 .localCheckpoint(eager=True))
    counts = sorted_df.groupBy("__pid").count().collect()
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((int(row["__pid"]), acc))
        acc += int(row["count"])
    spark = df.sparkSession
    off = F.broadcast(spark.createDataFrame(
        offsets or [(0, 0)], schema="__pid int, __off long"))
    w = Window.partitionBy("__pid").orderBy(*order_by)
    out = (sorted_df.join(off, "__pid")
           .withColumn(out_col,
                       F.col("__off") + F.row_number().over(w) - 1)
           .drop("__pid", "__off"))
    return (out, acc) if with_total else out


def snake_shard(rank: Column, n_shards: int) -> Column:
    """Boustrophedon shard index for a 0-based global rank: block
    ``rank // S`` deals ascending when even, descending when odd."""
    pos = rank % n_shards
    # (rank - pos) is exactly divisible, so the double division is exact
    # for any rank < 2^53 — a bare rank/S cast could round up at the
    # integer boundary for huge ranks
    block = ((rank - pos) / n_shards).cast("long")
    return F.when(block % 2 == 0, pos) \
        .otherwise(n_shards - 1 - pos).cast("int")


def plan_shards(df: DataFrame, n_shards: int, size_col: str = "n_tok",
                id_col: str = "doc_id") -> DataFrame:
    """Assign every row to one of ``n_shards`` size-balanced shards.
    Null sizes count as 0 (kept, never dropped).  Output: all input
    columns plus ``rank`` (global, size desc) and ``shard``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    size = F.coalesce(F.col(size_col).cast("long"), F.lit(0))
    ranked = global_rank(
        df.withColumn("__size", size),
        [F.col("__size").desc(), F.col(id_col).asc()])
    return (ranked
            .withColumn("shard", snake_shard(F.col("rank"), n_shards))
            .drop("__size"))


def shard_stats(df: DataFrame, n_shards: int, size_col: str = "n_tok",
                id_col: str = "doc_id") -> DataFrame:
    """Per-shard balance readout of :func:`plan_shards`: doc count, token
    total, min/max doc size, plus the plan-wide imbalance ratio
    ``max_shard_tokens / min_shard_tokens`` (micro-quantized — ONE IEEE
    division of exact int64 sums) repeated on every row for a
    self-contained report."""
    plan = plan_shards(df, n_shards, size_col, id_col)
    size = F.coalesce(F.col(size_col).cast("long"), F.lit(0))
    per = (plan.groupBy("shard")
           .agg(F.count("*").alias("n_docs"),
                F.sum(size).alias("tokens"),
                F.min(size).alias("min_doc"),
                F.max(size).alias("max_doc")))
    from ..functions.util import quantize
    # extremes via an unpartitioned window over the |shards|-bounded
    # relation — the crossJoin(agg) formulation re-evaluates the
    # per-shard aggregation lineage twice (the temperature_mixture
    # lesson)
    w_all = Window.partitionBy()
    mx = F.max("tokens").over(w_all)
    mn = F.min("tokens").over(w_all)
    return per.select(
        "*",
        F.when(mn > 0, quantize(mx.cast("double") / mn.cast("double"),
                                6)).alias("imbalance_u"))

"""Shard layout planning: global_rank exactness under repartitioning,
snake assignment vs a python mirror, balance bound vs round-robin,
null sizes, stats/imbalance readout."""
from pyspark.sql import Row
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.operators.layout import (
    global_rank, plan_shards, shard_stats)


def _docs(spark, sizes):
    return spark.createDataFrame(
        [Row(doc_id=i, n_tok=s) for i, s in enumerate(sizes)],
        "doc_id long, n_tok int")


def _mirror(sizes, n_shards):
    order = sorted(range(len(sizes)),
                   key=lambda i: (-(sizes[i] or 0), i))
    out = {}
    for rank, i in enumerate(order):
        block, pos = divmod(rank, n_shards)
        out[i] = pos if block % 2 == 0 else n_shards - 1 - pos
    return out


def test_global_rank_total_order_and_partition_invariant(spark):
    df = _docs(spark, [5, 9, 9, 1, 7, 9, 3])
    r1 = {r["doc_id"]: r["rank"] for r in global_rank(
        df, [F.col("n_tok").desc(), F.col("doc_id").asc()]).collect()}
    r2 = {r["doc_id"]: r["rank"] for r in global_rank(
        df.repartition(5),
        [F.col("n_tok").desc(), F.col("doc_id").asc()]).collect()}
    assert r1 == r2
    assert sorted(r1.values()) == list(range(7))
    # ties (the three 9s) rank by doc_id ascending
    assert r1[1] < r1[2] < r1[5]


def test_snake_matches_mirror(spark):
    sizes = [(i * 37) % 100 + 1 for i in range(23)]
    got = {r["doc_id"]: r["shard"]
           for r in plan_shards(_docs(spark, sizes), 4).collect()}
    assert got == _mirror(sizes, 4)


def test_snake_beats_round_robin_on_gradient(spark):
    # strictly decreasing sizes: round-robin (shard = rank % S) loads
    # shard 0 with every block's biggest doc; the snake cancels it
    sizes = list(range(100, 0, -1))
    plan = plan_shards(_docs(spark, sizes), 4).collect()
    snake_tot = {}
    rr_tot = {}
    for r in plan:
        snake_tot[r["shard"]] = snake_tot.get(r["shard"], 0) + r["n_tok"]
        rr = r["rank"] % 4
        rr_tot[rr] = rr_tot.get(rr, 0) + r["n_tok"]
    assert max(snake_tot.values()) - min(snake_tot.values()) \
        < max(rr_tot.values()) - min(rr_tot.values())
    # snake is near-perfect here: spread <= one max doc
    assert max(snake_tot.values()) - min(snake_tot.values()) <= 100


def test_null_sizes_kept_as_zero(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, n_tok=10), Row(doc_id=2, n_tok=None),
         Row(doc_id=3, n_tok=5)],
        "doc_id long, n_tok int")
    plan = plan_shards(df, 2).collect()
    assert len(plan) == 3
    by = {r["doc_id"]: r for r in plan}
    assert by[2]["rank"] == 2  # null -> 0 tokens, sorts last


def test_shard_stats_imbalance(spark):
    sizes = [8, 8, 8, 8, 2, 2, 2, 2]
    got = shard_stats(_docs(spark, sizes), 2).collect()
    assert len(got) == 2
    by = {r["shard"]: r for r in got}
    # snake over [8,8,8,8,2,2,2,2]: shard0 gets ranks 0,3,4,7 = 8+8+2+2,
    # shard1 gets 1,2,5,6 = 8+8+2+2 — perfectly balanced
    assert by[0]["tokens"] == by[1]["tokens"] == 20
    assert by[0]["n_docs"] == 4
    assert by[0]["imbalance_u"] == 1_000_000  # ratio 1.0 at 6dp

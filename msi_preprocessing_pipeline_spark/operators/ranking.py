"""Pairwise-preference rating models (Bradley–Terry).

The preference-pair table ``(winner, loser)`` is the canonical shape of
RLHF / reward-model training data and of interleaving experiments; the
Bradley–Terry strength vector is its standard summary statistic
(Bradley & Terry 1952; the minorization–maximization fit follows
Hunter 2004, "MM algorithms for generalized Bradley-Terry models",
Annals of Statistics).

Reference parity: the reference pipeline's iterative model fits
(``components/spectrum/model.py`` GMM EM) are the structural analogue —
a fixed-point refit over the full relation per round — recast here as a
bounded-state DataFrame iteration like ``operators.graph.pagerank``.

Determinism contract (the repo's exact-integer discipline): strengths
live on a ``10^-scale`` integer grid; every per-pair MM contribution is
one fixed IEEE-double expression over exact integers, floor-quantized
back to the grid BEFORE the (exact, associative) integer sum.  The
whole fit — including every intermediate iteration — is therefore
partition-order-free and reproducible bit-for-bit in any engine that
mirrors the expression tree, which is what lets the driver contract
unroll the iteration as plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bradley_terry(contests: DataFrame, winner_col: str = "winner",
                  loser_col: str = "loser", iters: int = 8,
                  scale: int = 9,
                  checkpoint_every: int = 1) -> DataFrame:
    """Bradley–Terry strengths from a ``(winner, loser)`` contest table
    via ``iters`` minorization–maximization rounds:

        s_i ← W_i / Σ_j  n_ij / (s_i + s_j)

    with ``W_i`` the item's total wins and ``n_ij`` the games played
    between ``i`` and ``j``.  Strengths start at 1 and are reported on
    the ``10^-scale`` integer grid as ``(item, s_n)`` (``s_n`` =
    strength · 10^scale, bigint); the model is identified only up to a
    positive constant, so compare ratios (or normalize downstream).

    Items that never win are pinned at strength 0 — their MLE limit —
    and kept in every join so opponents' denominators stay correct.
    The MLE is finite only when the comparison graph is strongly
    connected (Hunter 2004 §1); on a disconnected or all-win corpus
    individual strengths diverge, which on the grid shows up as values
    racing toward 0 / huge — the caller owns that data screen.

    Scale/plan shape: the contest table is reduced ONCE to two bounded
    relations — symmetric per-pair game counts ``n_ij`` (|item pairs
    that actually met|) and per-item wins (|items|) — so each MM round
    touches only model-sized state: two hash joins of the strength
    vector onto the pair counts (AQE broadcasts the |items| side), one
    map-side-combined integer sum, one win join.  The strength vector
    is referenced TWICE per round (both join sides), so without
    truncation the logical plan DOUBLES per iteration and Catalyst
    analysis blows up (the ``dedup.connected_components`` lesson) —
    ``checkpoint_every=1`` (default) ``localCheckpoint``s each round,
    and the two model relations are checkpointed once up front so
    their contest-scan lineage is executed once, not 2× per round.
    Nothing iterates over the raw contest rows.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from ..functions.util import DEC38

    sc = 10 ** scale
    w = F.col("__w")
    # ONE corpus scan: the directed-win histogram is the whole model —
    # checkpointed first so sym AND wtab derive from the bounded
    # relation instead of re-scanning contests
    wins_dir = (contests.groupBy(F.col(winner_col).alias("i"),
                                 F.col(loser_col).alias("j"))
                .agg(F.count("*").alias("__w"))
                .localCheckpoint())
    # symmetrize to n_ij on ordered (i, j): every (i, j) with any game
    # appears in BOTH orientations
    sym = (wins_dir.select("i", "j", "__w")
           .unionByName(wins_dir.select(F.col("j").alias("i"),
                                        F.col("i").alias("j"), "__w"))
           .groupBy("i", "j").agg(F.sum("__w").alias("n"))
           .localCheckpoint())
    items = sym.select(F.col("i").alias("item")).distinct()
    wtab = (items.join(wins_dir.groupBy(F.col("i").alias("item"))
                       .agg(F.sum("__w").alias("__w")), ["item"], "left")
            .select("item", F.coalesce(w, F.lit(0)).alias("w"))
            .localCheckpoint())
    s = items.select("item", F.lit(sc).cast("long").alias("s_n"))
    for k in range(iters):
        joined = (sym
                  .join(s.select(F.col("item").alias("i"),
                                 F.col("s_n").alias("si")), ["i"])
                  .join(s.select(F.col("item").alias("j"),
                                 F.col("s_n").alias("sj")), ["j"]))
        # fixed IEEE tree over exact ints, mirrored in the SQL oracle:
        # n / ((si + sj) / 10^scale), floor-quantized to the grid
        term = F.floor(
            F.col("n").cast("double")
            / (F.greatest(F.col("si") + F.col("sj"),
                          F.lit(1)).cast("double") / F.lit(float(sc)))
            * F.lit(float(sc)) + F.lit(0.5)).cast("long")
        denom = (joined.select(F.col("i").alias("item"),
                               term.cast(DEC38).alias("__t"))
                 .groupBy("item").agg(F.sum("__t").alias("ds")))
        s = (wtab.join(denom, ["item"])
             .select("item",
                     F.when(F.col("w") == 0, F.lit(0).cast("long"))
                     .otherwise(F.floor(
                         F.col("w").cast("double")
                         / (F.col("ds").cast("double") / F.lit(float(sc)))
                         * F.lit(float(sc)) + F.lit(0.5)).cast("long"))
                     .alias("s_n")))
        if checkpoint_every and (k + 1) % checkpoint_every == 0 \
                and k + 1 < iters:
            s = s.localCheckpoint()
    return s


def preference_pairs(df: DataFrame, group_col: str, id_col: str,
                     score_col: str, k: int = 4,
                     min_margin: int = 1) -> DataFrame:
    """Construct (chosen, rejected) preference pairs — the DPO / reward-
    model training shape — from scored items within each group: the
    group's ``k`` best items paired against its ``k`` worst, keeping
    pairs whose score margin is at least ``min_margin``.

    Order is total and engine-exact: rank by ``(score desc, id asc)``
    for the chosen side and ``(score asc, id desc)`` for the rejected
    side, so an item can appear on both sides only when the group has
    fewer than ``2k`` items — such degenerate self-or-crossing pairs
    are removed by requiring ``chosen_rank + rejected_rank`` to address
    DISTINCT items (chosen != rejected) plus the margin filter.

    Output: ``(group, chosen_id, rejected_id, chosen_score,
    rejected_score, margin)`` with ``margin = chosen - rejected``.

    Scale shape: two per-group window ranks (ONE shuffle on the group
    key — both windows share it) cut the relation to <= k rows per
    group per side, then one group-key equi-join fans out <= k² pairs
    per group — bounded, no cross join, no skew beyond 2k rows per
    group.  Scores should be exact integers (the repo-wide determinism
    contract); margins then hash-pin across engines.
    """
    from pyspark.sql import Window

    g, i, s = F.col(group_col), F.col(id_col), F.col(score_col)
    base = df.where(s.isNotNull()).select(
        g.alias("grp"), i.alias("item"), s.alias("score"))
    w_top = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("item").asc())
    w_bot = Window.partitionBy("grp").orderBy(
        F.col("score").asc(), F.col("item").desc())
    ranked = base.select(
        "grp", "item", "score",
        F.row_number().over(w_top).alias("__rt"),
        F.row_number().over(w_bot).alias("__rb"))
    top = ranked.where(F.col("__rt") <= k).select(
        "grp", F.col("item").alias("chosen_id"),
        F.col("score").alias("chosen_score"))
    bot = ranked.where(F.col("__rb") <= k).select(
        "grp", F.col("item").alias("rejected_id"),
        F.col("score").alias("rejected_score"))
    return (top.join(bot, "grp")
            .where((F.col("chosen_id") != F.col("rejected_id"))
                   & (F.col("chosen_score") - F.col("rejected_score")
                      >= F.lit(min_margin)))
            .select(F.col("grp").alias(group_col),
                    "chosen_id", "rejected_id",
                    "chosen_score", "rejected_score",
                    (F.col("chosen_score") - F.col("rejected_score"))
                    .alias("margin")))

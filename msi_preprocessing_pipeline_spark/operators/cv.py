"""Temporal cross-validation and negative sampling for training sets.

Two leakage-sensitive training-data constructions:

* :func:`time_folds` + :func:`purged_train_test` — equal-frequency
  TEMPORAL folds with an embargo gap (purged time-series CV, López de
  Prado 2018): the test fold is a contiguous time slice, and training
  rows within ``embargo`` of the test window are dropped so serially
  correlated features cannot leak across the boundary.  The same
  discipline as ``operators.training``'s strictly-prior windows,
  applied at the split level.
* :func:`negative_samples` — deterministic hash-based negative
  sampling for contrastive / implicit-feedback training: every
  (user, positive) pair draws ``k`` pseudo-random items from the
  catalog via the engine-portable md5 idiom (``operators.sampling``),
  so the sample is reproducible, partition-invariant and
  SQL-oracle-able.

Scale notes: fold edges are ONE ``percentile`` aggregation broadcast
back (no ntile — rank-based splits are tie- and partition-unstable);
embargo bounds are a |folds|-sized relation.  Negative sampling is a
slot explode (k×) + catalog equi-join (AQE broadcasts a small
catalog) + one anti-join against the positives; the catalog index is
a |items|-bounded window — document: assumes a bounded item catalog,
not 10^12 distinct items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .encoding import quantile_bin


def time_folds(df: DataFrame, ts_col: str = "ts", n_folds: int = 5,
               out_col: str = "fold") -> DataFrame:
    """Assign each row an equal-frequency temporal fold id in
    ``0 … n_folds-1`` from the EXACT quantile edges of the event time
    (epoch millis).  Edge-based like :func:`..encoding.quantile_bin`
    (same machinery): identical timestamps always share a fold, and
    the assignment is partition-invariant.  Null timestamps get a null
    fold (filter upstream if that is wrong).
    """
    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2, got {n_folds}")
    # exact integer millis (unix_millis), NOT double-seconds*1000 — the
    # double fraction is inexact and truncation could land a boundary
    # row in the wrong fold
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    binned = quantile_bin(df.withColumn("__fold_ms", ms), "__fold_ms",
                          n_bins=n_folds, out_col=out_col)
    return binned.drop("__fold_ms")


def purged_train_test(df: DataFrame, test_fold: int,
                      ts_col: str = "ts", fold_col: str = "fold",
                      embargo_s: float = 0.0) -> DataFrame:
    """Flag rows for a purged temporal split: ``is_test`` (row in
    ``test_fold``), ``in_embargo`` (non-test row within ``embargo_s``
    seconds of the test fold's [min, max] time span), and ``is_train``
    (neither).  Train/test never overlap in time modulo the embargo,
    so features with up-to-``embargo_s`` of serial memory cannot leak
    across the boundary.

    The test span is a 1-row broadcast aggregate entering the plan
    lazily (no eager job); the flags are map-only expressions.  If the
    test fold is empty, nothing is embargoed and ``is_train`` is true
    for every other row.
    """
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    span = (df.where(F.col(fold_col) == F.lit(int(test_fold)))
            .agg(F.min(ms).alias("__t_lo"),
                 F.max(ms).alias("__t_hi")))
    out = df.crossJoin(F.broadcast(span))
    # exact integer-millis arithmetic end to end (no double truncation)
    embargo_ms = int(round(float(embargo_s) * 1000))
    lo = F.col("__t_lo") - F.lit(embargo_ms)
    hi = F.col("__t_hi") + F.lit(embargo_ms)
    is_test = F.col(fold_col) == F.lit(int(test_fold))
    in_embargo = (~is_test & F.col("__t_lo").isNotNull()
                  & (ms >= lo) & (ms <= hi))
    return (out.withColumn("is_test", is_test)
            .withColumn("in_embargo", in_embargo)
            .withColumn("is_train", ~is_test & ~in_embargo)
            .drop("__t_lo", "__t_hi"))


def negative_samples(positives: DataFrame, items: DataFrame,
                     user_col: str, item_col: str, k: int = 2,
                     seed: int = 0) -> DataFrame:
    """Deterministic negative sampling: for every positive
    ``(user, item)`` pair, draw ``k`` candidate items from the catalog
    by hashing ``(user, item, slot, seed)`` into a dense catalog index,
    then drop candidates that are actually positives for that user
    (anti-join) — so fewer than ``k`` negatives survive when a draw
    collides with a true positive (stated, not resampled: resampling
    would make the output depend on the collision set and lose
    SQL-oracle-ability).

    Output: ``(user, item, slot, neg_item)`` — one row per surviving
    draw.  The dense index is a row_number over the DISTINCT catalog
    ordered by item id: a |items|-bounded single-partition window,
    fine for real catalogs (≤ ~10^8), documented as the bound.  Null
    item ids are dropped from the catalog before indexing (engines
    disagree on null ordering — Spark sorts nulls first, most SQL
    engines last — which would shift every index and break the
    cross-engine reproducibility contract).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from ..functions.util import md5_bucket

    idx_w = Window.orderBy(item_col)
    catalog = (items.select(item_col)
               .where(F.col(item_col).isNotNull()).distinct()
               .select(F.col(item_col).alias("__neg_item"),
                       (F.row_number().over(idx_w) - 1).cast("long")
                       .alias("__idx")))
    n_items = catalog.agg(F.count("*").alias("__n_items"))
    slots = F.explode(F.array(*[F.lit(s) for s in range(int(k))]))
    cand = (positives.select(F.col(user_col), F.col(item_col))
            .withColumn("slot", slots)
            .crossJoin(F.broadcast(n_items)))
    key = F.concat_ws(
        ":", F.col(user_col).cast("string"),
        F.col(item_col).cast("string"),
        F.col("slot").cast("string"), F.lit(str(seed)))
    cand = (cand.withColumn(
        "__idx", md5_bucket(key, F.col("__n_items")).cast("long"))
        .drop("__n_items"))
    joined = (cand.join(catalog, "__idx").drop("__idx")
              .withColumnRenamed("__neg_item", "neg_item"))
    pos_keys = positives.select(
        F.col(user_col), F.col(item_col).alias("neg_item")).distinct()
    return (joined.join(pos_keys, [user_col, "neg_item"], "left_anti")
            .select(user_col, item_col, "slot", "neg_item"))


def group_kfold(df: DataFrame, group_col: str, n_folds: int = 5,
                seed: int = 7, out_col: str = "fold") -> DataFrame:
    """Group-stable k-fold assignment: every row of a group lands in the
    SAME fold (the scikit-learn ``GroupKFold`` contract — entity-level
    leakage protection for temporally-unstructured features; use
    :func:`time_folds` / :func:`purged_train_test` when leakage is
    serial).  Fold = the engine-portable md5 bucket of the group key
    (``functions.util.md5_bucket``), so the split is deterministic,
    partition-invariant, reproducible across engines/runs, and STABLE
    under corpus growth — a group keeps its fold when new rows arrive,
    the property a ``row_number % k`` or ``ntile`` split lacks.

    Map-only (zero shuffles, no group materialization — the bucket is a
    per-row expression on the key).  Null group keys get a null fold:
    they are no one's entity, and silently pooling them into fold 0
    would leak every null-keyed row into one split.

    Folds are md5-uniform in GROUP count; byte balance follows group
    sizes (report skew with ``profile.key_profile`` and cap dominant
    groups upstream if needed).
    """
    from ..functions.util import md5_bucket

    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2, got {n_folds}")
    fold = md5_bucket(
        F.concat(F.col(group_col).cast("string"), F.lit(f":gkf:{seed}")),
        n_folds)
    return df.withColumn(
        out_col,
        F.when(F.col(group_col).isNotNull(), fold.cast("int")))

"""Range (interval) join — a point column against [lo, hi] intervals.

Vanilla Spark compiles ``point BETWEEN lo AND hi`` to a broadcast
nested-loop / cartesian theta-join: O(points × intervals) comparisons — a
scale killer. The standard fix is BUCKETIZATION: map each point to the
bucket ``floor(point / w)``, explode each interval to every bucket it
covers, EQUI-join on the bucket id (hash join, shuffle on bucket), then
re-verify the exact predicate. Candidate volume is
``points + Σ interval_width/w`` join rows instead of the cross product;
``bucket_width`` trades replication of wide intervals against bucket
collision rates (pick ≈ the median interval width).

Wide-interval guard: one interval spanning ≫ ``bucket_width`` (an
open-ended band, or a caller picking w far below the median width) would
explode to a multi-million-element array in a single row — executor OOM.
Intervals covering more than ``wide_buckets`` buckets are therefore routed
through a BROADCAST theta-join branch instead (wide intervals are few in
real workloads — that's why they're wide); if more than ``max_wide`` of
them exist the join fails fast with an actionable error rather than
OOM-ing the driver broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__range_bucket"


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               lo_col: str, hi_col: str, bucket_width: float,
               how: str = "inner", wide_buckets: int = 4096,
               max_wide: int = 1_000_000) -> DataFrame:
    """Join every point row to every interval row with
    ``lo <= point <= hi``. Column names must be disjoint across the two
    inputs (rename beforehand). ``how``: ``inner`` or ``left`` (unmatched
    points keep null interval columns).

    Physical plan: intervals spanning ≤ ``wide_buckets`` buckets take the
    bucketized equi-join; wider ones take a broadcast theta-join (≤
    ``max_wide`` of them, else ``ValueError``). Both branches re-verify the
    exact predicate, so the union is the exact range-join result.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    w = float(bucket_width)
    lo_b = F.floor(F.col(lo_col) / w).cast("long")
    hi_b = F.floor(F.col(hi_col) / w).cast("long")
    span = hi_b - lo_b + F.lit(1)
    narrow = intervals.where(span <= F.lit(int(wide_buckets)))
    wide = intervals.where(span > F.lit(int(wide_buckets)))
    # limit-probe, not count(): costs ≤ max_wide+1 rows even when the
    # intervals plan is expensive; empty in the common case
    n_wide = wide.limit(int(max_wide) + 1).count()
    if n_wide > max_wide:
        raise ValueError(
            f"range_join: more than {max_wide} intervals span more than "
            f"{wide_buckets} buckets of width {w} — the broadcast branch "
            f"would not fit. Increase bucket_width toward the median "
            f"interval width (or raise wide_buckets/max_wide).")

    cond = F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    p = points.withColumn(_B, F.floor(F.col(point_col) / w).cast("long"))
    i = narrow.withColumn(_B, F.explode(F.sequence(lo_b, hi_b)))

    inner_narrow = p.join(i, _B).where(cond).drop(_B)
    if how == "inner":
        if n_wide == 0:
            return inner_narrow
        return inner_narrow.unionByName(
            points.join(F.broadcast(wide), cond, "inner"))

    # left: each point row appears exactly once on the bucketized left side
    # (only intervals are exploded, and an interval covers the point's
    # bucket at most once), so the outer join's null-extension is per
    # original point row.
    left_narrow = p.join(i, on=[p[_B] == i[_B], cond], how="left").drop(_B)
    if n_wide == 0:
        return left_narrow
    # bag-correct composition with the wide branch:
    #   matches   = inner(narrow) ∪ inner(wide)   (disjoint interval sets)
    #   null rows = point rows unmatched in narrow AND unmatched in wide
    unmatched_narrow = (left_narrow
                        .where(F.col(lo_col).isNull())
                        .select(*points.columns))
    wide_tail = unmatched_narrow.join(F.broadcast(wide), cond, "left")
    return (inner_narrow
            .unionByName(points.join(F.broadcast(wide), cond, "inner"))
            .unionByName(wide_tail.where(F.col(lo_col).isNull())))


def salted_join(left: DataFrame, right: DataFrame, on, spread_col: str,
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-salted equi-join: result-identical to ``left.join(right, on,
    how)`` but the shuffle key is ``(on…, salt)`` so one hot join key
    spreads over ``n_salt`` reducers instead of serializing on one.

    The big/skewed side (``left``) gets a deterministic salt from
    ``spread_col`` (any well-distributed column — a unique id; NOT the
    join key, which is constant within the hot group) via the shared
    cross-engine ``md5_bucket`` idiom; the right side is replicated
    ``n_salt``× with ``explode(sequence(...))`` — JVM-side, no Python.
    Replication is bag-correct: each (left row, right row) key match
    meets on exactly one salt value, so multiplicities are preserved
    for ``inner`` and ``left`` (the supported modes — ``right``/
    ``full`` would need null-extension dedup across salts; use the
    unsalted join or swap sides).

    When to use: ``profile.join_size_estimate``'s ``top_key_share``
    near 1 with a multi-billion-row ``est_rows`` — AQE's skew-join
    split handles sort-merge spill skew, but a single hot KEY still
    lands in one post-split partition per side; salting is the
    explicit, planner-independent fix.  Cost: ``n_salt``× replication
    of ``right`` — keep ``right`` the smaller relation.

    Scale notes: one shuffle per side on ``(on…, salt)``; null join
    keys never match (SQL semantics) and are pre-filtered from the
    replicated side (they cannot match anything, so replicating them
    ``n_salt``× would be pure waste) while ``left`` keeps its rows
    (left-join null extension preserved).
    """
    from ..functions.util import as_list, md5_bucket

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    keys = as_list(on)
    out_cols = left.columns + [c for c in right.columns
                               if c not in keys]
    l_s = left.withColumn(
        "__salt", md5_bucket(F.col(spread_col).cast("string"), n_salt))
    r_notnull = right
    for k in keys:
        r_notnull = r_notnull.where(F.col(k).isNotNull())
    r_s = (r_notnull
           .withColumn("__salt",
                       F.explode(F.sequence(F.lit(0),
                                            F.lit(n_salt - 1))))
           .withColumn("__salt", F.col("__salt").cast("long")))
    return (l_s.join(r_s, keys + ["__salt"], how)
            .select(*out_cols))

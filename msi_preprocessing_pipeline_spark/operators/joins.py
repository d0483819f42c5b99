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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__range_bucket"


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               lo_col: str, hi_col: str, bucket_width: float,
               how: str = "inner") -> DataFrame:
    """Join every point row to every interval row with
    ``lo <= point <= hi``. Column names must be disjoint across the two
    inputs (rename beforehand). ``how``: ``inner`` or ``left`` (unmatched
    points keep null interval columns)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    w = float(bucket_width)
    p = points.withColumn(_B, F.floor(F.col(point_col) / w).cast("long"))
    i = intervals.withColumn(
        _B, F.explode(F.sequence(
            F.floor(F.col(lo_col) / w).cast("long"),
            F.floor(F.col(hi_col) / w).cast("long"))))
    cond = F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    if how == "inner":
        return (p.join(i, _B).where(cond)
                .drop(_B))
    # left: keep unmatched points — verify inside the join condition so the
    # outer join's null-extension remains correct
    joined = p.join(i, on=[p[_B] == i[_B], cond], how="left")
    return joined.drop(_B)

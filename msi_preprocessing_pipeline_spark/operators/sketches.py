"""Sketch-based distinct counting: Apache DataSketches HLL via Spark's
built-in ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``.

At 10^12 rows an exact ``countDistinct`` over a high-cardinality key is a
full shuffle of every distinct value; the HLL sketch is a few KB per group,
map-side combined, and — because register-max merging is commutative and
associative — the estimate is DETERMINISTIC regardless of partitioning or
merge order, so it is golden-pinnable like the other seeded operators.

The two-level API models the incremental-pipeline shape: persist per-slice
sketches (e.g. one row per day x group), then union any subset of slices to
answer "distinct users over an arbitrary date range" without rescanning raw
data — the classic pre-aggregated-sketch rollup.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def distinct_sketches(df: DataFrame, key: str, group_by,
                      lg_k: int = 12,
                      sketch_col: str = "hll_sketch") -> DataFrame:
    """One HLL sketch (binary) per group over ``key`` — the persistable
    intermediate. ``lg_k=12`` -> 4096 registers, ~1.6% relative error."""
    return (df.groupBy(*_as_list(group_by))
            .agg(F.hll_sketch_agg(F.col(key), F.lit(lg_k))
                 .alias(sketch_col)))


def merge_sketches(sketches: DataFrame, group_by,
                   sketch_col: str = "hll_sketch",
                   out_col: str = "n_distinct") -> DataFrame:
    """Union per-slice sketches down to ``group_by`` and estimate: the
    date-range rollup over a pre-aggregated sketch table."""
    keys = _as_list(group_by)
    agg = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    merged = (sketches.groupBy(*keys).agg(agg) if keys
              else sketches.groupBy().agg(agg))
    return merged.select(
        *keys, F.hll_sketch_estimate(F.col(sketch_col)).alias(out_col))


def approx_distinct(df: DataFrame, key: str, group_by,
                    lg_k: int = 12,
                    out_col: str = "n_distinct") -> DataFrame:
    """Direct per-group approximate distinct count (sketch + estimate in
    one aggregation — no intermediate table)."""
    return (df.groupBy(*_as_list(group_by))
            .agg(F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(key), F.lit(lg_k))).alias(out_col)))

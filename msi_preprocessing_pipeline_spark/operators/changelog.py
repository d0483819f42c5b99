"""Changelog application (CDC apply / MERGE-like upsert without a table
format): fold a stream of keyed upserts and deletes into a base snapshot.

The whole operation is one union + one latest-per-key window + one filter —
a single shuffle on the key, no join. At 10^12 rows this beats the
join-based MERGE shape (which shuffles base AND changes, then unions the
anti-join remainder): every row moves exactly once, ties are resolved by
``(ts, seq)`` so replays and out-of-order delivery are deterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.util import as_list


def apply_changelog(base: DataFrame, changes: DataFrame,
                    key: Sequence[str] | str, ts_col: str,
                    op_col: str = "op",
                    tiebreak: Sequence[str] | None = None) -> DataFrame:
    """New snapshot = ``base`` with ``changes`` applied.

    ``changes`` carries the base columns plus ``op_col`` with values
    ``'u'`` (upsert: insert or replace) and ``'d'`` (delete). For each key
    the row with the greatest ``(ts, *tiebreak)`` wins — base rows rank
    below any change with an equal-or-later timestamp (base is the "oldest
    version" of its key). Deletes win like upserts, then drop out.
    """
    keys = as_list(key)
    cols = base.columns
    b = base.select(*cols, F.lit("u").alias("__op"),
                    F.lit(0).alias("__src"))
    # an unrecognized op must not silently act as a delete (the winning
    # row would just be filtered out) — fail the job row-side instead
    op = F.when(F.col(op_col).isin("u", "d"), F.col(op_col)).otherwise(
        F.raise_error(F.concat(F.lit("apply_changelog: op must be "
                                     "'u' or 'd', got "),
                               F.col(op_col).cast("string"))))
    c = changes.select(*cols, op.alias("__op"), F.lit(1).alias("__src"))
    unioned = b.unionByName(c)
    order = [F.col(ts_col).desc(), F.col("__src").desc()] + \
        [F.col(t).desc() for t in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (unioned.withColumn("__rn", F.row_number().over(w))
            .where((F.col("__rn") == 1) & (F.col("__op") == "u"))
            .select(*cols))

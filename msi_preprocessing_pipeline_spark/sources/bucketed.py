"""Bucketed table layout for shuffle-free co-located joins.

At 100 TB, repeated joins on a hot key (e.g. ``doc_id`` between the sequence
table and per-doc side tables, or ``shingle`` between fingerprint tables)
should not re-shuffle per query: writing both sides bucketed by the join key
lets Spark plan a SortMergeJoin with NO Exchange on either side
(``test_plan_shapes.py::test_bucketed_join_has_no_exchange`` pins this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16,
                   sort_by: str | None = None) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered) table in
    the session catalog/warehouse."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)

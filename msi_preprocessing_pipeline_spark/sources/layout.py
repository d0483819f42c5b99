"""Clustered table layout: the write-side half of the serving plan.

The flagship serve path is shuffle-free BECAUSE the input is laid out
right: hive-partitioned on the coarse key (partition pruning), range-
partitioned into files on the entity key (each file owns a disjoint key
range), rows inside each file sorted by ``(entity, ts)`` (as-of scans are
sequential; parquet min/max row-group stats become effective zone maps).
This module writes that layout; `test_layout.py` pins all three
properties by reading the files back.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..functions.util import as_list


def write_clustered(df: DataFrame, path: str,
                    partition_by: Sequence[str] | str | None = None,
                    range_by: Sequence[str] | str | None = None,
                    sort_by: Sequence[str] | str | None = None,
                    n_files: int | None = None,
                    mode: str = "error") -> None:
    """Write ``df`` as parquet with a clustered physical layout.

    ``partition_by``: hive directory partitioning (coarse, low-cardinality
    — source, date) for partition PRUNING. ``range_by``: range-partition
    the rows into ``n_files`` output files on these columns — every file
    covers a disjoint key range, so a key-range read touches one file.
    ``sort_by``: sort rows WITHIN each file (defaults to ``range_by``) —
    parquet row-group min/max stats turn into zone maps and as-of/window
    consumers read runs, not random rows.

    One range exchange total; the sort is within partitions (no extra
    shuffle).
    """
    opt = lambda x: [] if x is None else as_list(x)  # noqa: E731
    rb, sb, pb = opt(range_by), opt(sort_by), opt(partition_by)
    out = df
    if rb:
        out = (out.repartitionByRange(n_files, *rb) if n_files
               else out.repartitionByRange(*rb))
    elif n_files:
        out = out.repartition(n_files)
    # the hive writer requires rows ordered by the partition columns within
    # each task (it re-sorts otherwise, destroying the clustering order) —
    # lead with them so the requirement is satisfied and the tail order
    # survives into the files
    eff_sort = pb + [c for c in (sb or rb) if c not in pb]
    if eff_sort:
        out = out.sortWithinPartitions(*eff_sort)
    writer = out.write.mode(mode)
    if pb:
        writer = writer.partitionBy(*pb)
    writer.parquet(path)

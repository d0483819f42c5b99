"""Sequence-table source: Iceberg catalog identifiers or raw paths.

The north rule frames the input as an Iceberg table of pre-tokenized
sequences. Iceberg is a *catalog/format* concern, orthogonal to every plan
in this engine: jobs address the table either by catalog identifier
(``catalog.db.sequences`` → ``spark.read.table``, which resolves Iceberg /
Hive / any V2 source the session has configured, with full pushdown +
partition pruning through the DSv2 scan) or by storage path (parquet
directory — what the sandbox tests use; no Iceberg runtime jars ship in
this container).

Time travel (the PIT story at the STORAGE level, complementing the engine's
as-of artifact versioning): pass ``snapshot_id`` or ``as_of_timestamp`` —
forwarded as the Iceberg DSv2 read options (``snapshot-id`` /
``as-of-timestamp``). On non-Iceberg sources these raise at read time,
which is the honest behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PATH_MARKERS = ("/", "file:", "s3:", "s3a:", "hdfs:", "abfs", "gs:")


def is_path(location: str) -> bool:
    return location.startswith(_PATH_MARKERS) or "/" in location


def read_sequences(spark: SparkSession, location: str,
                   snapshot_id: int | None = None,
                   as_of_timestamp_ms: int | None = None) -> DataFrame:
    """Read the tokenized-sequence table from a catalog identifier or path."""
    if is_path(location):
        if snapshot_id is not None or as_of_timestamp_ms is not None:
            raise ValueError(
                "time travel requires a catalog (Iceberg) table identifier, "
                "not a raw path")
        return spark.read.parquet(location)
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(int(snapshot_id)))
    if as_of_timestamp_ms is not None:
        reader = reader.option("as-of-timestamp",
                               str(int(as_of_timestamp_ms)))
    return reader.table(location)


def write_sequences(df: DataFrame, location: str,
                    mode: str = "overwrite") -> None:
    """Write the sequence table to a catalog table (``saveAsTable`` — V2
    sources like Iceberg apply their own partition spec) or a parquet path."""
    if is_path(location):
        df.write.mode(mode).parquet(location)
    else:
        df.write.mode(mode).saveAsTable(location)

"""Reference-format Bruker ASCII spectrum reader.

Reproduces the reference's ingest surface (SURVEY.md §2.1 S1–S3):

* directory scan filtering ``*.txt`` case-insensitively
  (``components/io_utils.py:9-22``);
* two-column space-delimited spectra with a decimal-comma fallback
  (``components/io_utils.py:25-30``);
* ``_R<d>X<d>Y<d>_`` filename coordinate extraction
  (``pipeline/metadata.py:18-35``).

Implementation: ``wholetext`` read (one row per file, preserving line order —
the reference relies on file order for row identity) + a vectorized parse
UDF; coordinates via JVM ``regexp_extract`` on the file name.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COORD_PATTERN = r"_R(\d+)X(\d+)Y(\d+)_"


def read_spectra_dir(spark: SparkSession, root: str,
                     source: str | None = None) -> DataFrame:
    """All ``*.txt`` spectra under ``root`` →
    ``(path, source, R, X, Y, mz array<double>, counts array<double>)``."""
    raw = (spark.read.text(root, wholetext=True,
                           pathGlobFilter="*.[tT][xX][tT]")
           .select(F.input_file_name().alias("path"), F.col("value")))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mzs, counts = [], []
            for content in pdf["value"]:
                text = str(content)
                # decimal-comma fallback: reference retries the whole file
                # with decimal=',' on parse failure
                if "," in text:
                    text = text.replace(",", ".")
                mat = np.loadtxt(text.splitlines(), dtype=float, ndmin=2)
                mzs.append(mat[:, 0])
                counts.append(mat[:, 1])
            yield pd.DataFrame({"path": pdf["path"], "mz": mzs,
                                "counts": counts})

    parsed = raw.mapInPandas(
        parse, schema="path string, mz array<double>, counts array<double>")
    out = parsed.select(
        "path",
        (F.lit(source) if source is not None
         else F.element_at(F.split(F.col("path"), "/"), -2)).alias("source"),
        F.regexp_extract("path", COORD_PATTERN, 1).cast("int").alias("R"),
        F.regexp_extract("path", COORD_PATTERN, 2).cast("int").alias("X"),
        F.regexp_extract("path", COORD_PATTERN, 3).cast("int").alias("Y"),
        "mz", "counts")
    return out


def metadata_table(spectra: DataFrame) -> DataFrame:
    """The AssembleMetadata analog (``pipeline/metadata.py:48-69``): one
    (R, X, Y) row per spectrum, ordered like the data (sorted path)."""
    return spectra.select("source", "path", "R", "X", "Y").orderBy("path")

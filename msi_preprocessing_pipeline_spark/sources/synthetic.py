"""Distributed deterministic generation of the tokenized-sequence table.

The table shape is the ``BASELINE.json`` input hint:
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``.
Generation is a pure function of (source, doc_id) — kernels.synth — so any
partitioning/parallelism yields byte-identical payloads, and the numpy oracle
can regenerate the exact same rows locally.

Skew: ``skew_factor`` multiplies the first source's row count so the as-of
join's salting path has a genuinely hot entity to chew on (FIXTURES.md F1).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import synth

SEQUENCE_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def source_plan(n_sources: int, rows_per_source: int,
                skew_factor: int = 1) -> dict[str, int]:
    """Named sources with row counts; source 0 optionally skewed."""
    plan = {}
    for i in range(n_sources):
        n = rows_per_source * (skew_factor if i == 0 else 1)
        plan[f"src-{i:03d}"] = n
    return plan


def sequences_df(spark: SparkSession, sources: dict[str, int],
                 base_channels: int = 2048,
                 partitions: int | None = None) -> DataFrame:
    """Generate the sequence table distributed: a (source, idx) spine via
    ``spark.range`` per source, token payloads via ``mapInPandas``."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    spines = []
    for source in sorted(sources):
        n = sources[source]
        spines.append(
            spark.range(n).select(
                F.col("id").alias("idx"), F.lit(source).alias("source")))
    spine = spines[0]
    for s in spines[1:]:
        spine = spine.unionByName(s)
    spine = spine.repartition(partitions, "source", "idx")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, tokens, n_toks = [], [], []
            for idx, src in zip(pdf["idx"], pdf["source"]):
                doc_id = f"{src}-{int(idx):08d}"
                toks = synth.row_tokens(src, doc_id, base_channels)
                doc_ids.append(doc_id)
                tokens.append(toks)
                n_toks.append(toks.size)
            yield pd.DataFrame({
                "doc_id": doc_ids, "tokens": tokens,
                "n_tok": pd.array(n_toks, dtype="int32"),
                "source": [s for s in pdf["source"]],
            })

    return spine.mapInPandas(gen, schema=SEQUENCE_SCHEMA)


def source_axes_for(sources, base_channels: int = 2048) -> dict:
    """Per-source raw m/z axes (the artifact the resampling stage consumes)."""
    return {s: synth.source_axis(s, base_channels) for s in sources}

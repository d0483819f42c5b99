"""End-to-end corpus curation: the composition a training-data pipeline
actually runs before tokenization, built entirely from this engine's
operators.

    quality filter  →  benchmark decontamination  →  exact dedup
                    →  MinHash near-dup clustering (keep cluster min)
                    →  optional duplicated-passage cutting (substring dedup)

Every stage is a lazy DataFrame transformation — one program, one Catalyst
plan per output, no driver materialization of the corpus. ``with_report``
adds per-stage survivor counts (one count action per stage, on the cheap
projected relations).

Scale notes: quality + fingerprinting are shuffle-free JVM expressions;
decontamination broadcasts the (small) benchmark shingle set; exact dedup
shuffles once on the fingerprint; the near-dup stage is the bucketed
MinHash-LSH path with the ``star_over`` giant-cluster guard and the
``max_df`` hot-shingle cap — every skew guard in the engine is on.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup
from ..operators import text as tx


@dataclass
class CurationConfig:
    min_words: int = 10
    max_words: int = 5000
    min_mean_word_len: float = 2.0
    max_mean_word_len: float = 12.0
    max_punct_ratio: float = 0.2
    max_top_ngram_frac: float = 0.3
    max_dup_ngram_frac: float = 0.6
    decontaminate_k: int = 5
    decontaminate_min_common: int = 3
    minhash_hashes: int = 64
    minhash_bands: int = 16
    shingle_words: int = 3
    near_dup_threshold: float = 0.7
    star_over: int | None = 64
    max_df: int | None = 1000
    # substring-level pass: None disables; an int n cuts passages of >= n
    # words shared across surviving docs (Lee et al. 2022). Its df-cap is
    # SEPARATE from max_df: the most-replicated boilerplate is exactly what
    # this stage exists to cut, so by default NO passage is exempt
    cut_span_words: int | None = None
    cut_span_max_df: int | None = None
    report: dict = field(default_factory=dict)


def quality_pass(docs: DataFrame, cfg: CurationConfig,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Rows passing the Gopher-style quality gates."""
    q = tx.quality_metrics(docs, text_col)
    r = tx.repetition_metrics(docs, n=2, text_col=text_col, id_col=id_col)
    keep = ((F.col("n_words") >= cfg.min_words)
            & (F.col("n_words") <= cfg.max_words)
            & (F.col("mean_word_len") >= cfg.min_mean_word_len)
            & (F.col("mean_word_len") <= cfg.max_mean_word_len)
            & (F.col("punct_ratio") <= cfg.max_punct_ratio)
            & (F.col("top_ngram_frac") <= cfg.max_top_ngram_frac)
            & (F.col("dup_ngram_frac") <= cfg.max_dup_ngram_frac))
    return (q.join(r, id_col).where(keep)
            .select(*docs.columns))


def curate_corpus(docs: DataFrame, benchmark: DataFrame | None,
                  cfg: CurationConfig | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  with_report: bool = False) -> DataFrame:
    """The full curation chain; returns the surviving document rows.

    ``benchmark=None`` skips decontamination. ``with_report=True`` records
    per-stage survivor counts in ``cfg.report`` (runs one count per stage).
    """
    cfg = cfg or CurationConfig()

    def note(stage: str, df: DataFrame) -> DataFrame:
        if with_report:
            cfg.report[stage] = df.count()
        return df

    note("input", docs)
    kept = note("quality", quality_pass(docs, cfg, text_col, id_col))

    if benchmark is not None:
        contaminated = dedup.decontaminate(
            kept, benchmark, text_col=text_col, id_col=id_col,
            k=cfg.decontaminate_k, min_common=cfg.decontaminate_min_common,
            max_df=cfg.max_df)
        kept = note("decontaminated",
                    kept.join(contaminated.select(id_col), id_col,
                              "left_anti"))

    fp = tx.fingerprint(text_col)
    kept = note("exact_dedup",
                dedup.dedup_exact(kept.withColumn("__fp", fp),
                                  "__fp", tiebreak=id_col)
                .where(F.col("is_kept")).drop("__fp", "is_kept"))

    sigs = dedup.minhash_signatures(kept, text_col, id_col,
                                    n_hashes=cfg.minhash_hashes,
                                    shingle_words=cfg.shingle_words)
    pairs = dedup.minhash_lsh_pairs(sigs, id_col,
                                    bands=cfg.minhash_bands,
                                    threshold=cfg.near_dup_threshold,
                                    star_over=cfg.star_over)
    clusters = dedup.connected_components(pairs)
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")) \
        .select(F.col("doc_id").alias(id_col))
    kept = note("near_dedup", kept.join(drop, id_col, "left_anti"))

    if cfg.cut_span_words is not None:
        # substring pass runs AFTER doc-level dedup: the passages that
        # remain shared across distinct surviving docs are boilerplate,
        # cut in place (docs left with no words drop out)
        spans = dedup.duplicate_spans(kept, n=cfg.cut_span_words,
                                      text_col=text_col, id_col=id_col,
                                      max_df=cfg.cut_span_max_df)
        cut = dedup.cut_spans(kept, spans, text_col=text_col,
                              id_col=id_col, out_col=text_col)
        keep_cols = [c for c in kept.columns if c != text_col]
        kept = note("span_cut",
                    kept.select(*keep_cols)
                    .join(cut.select(id_col, text_col), id_col))
    return kept

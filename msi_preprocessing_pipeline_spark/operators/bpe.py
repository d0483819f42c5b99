"""Byte-pair-encoding tokenizer: fit on a corpus, encode documents.

The industry-standard split of work (how real BPE trainers scale):
  1. ``word_frequencies`` — ONE distributed shuffle reduces the corpus to
     its distinct-word histogram (vocabulary-sized, e.g. ~10^6 rows for
     10^12 tokens of text);
  2. ``fit_bpe`` — the merge loop runs DRIVER-side over that bounded
     histogram (like the IVF centroid fit: the input is small by
     construction, collected under an explicit cap). Deterministic: merge
     choice breaks count ties lexicographically;
  3. ``encode_bpe`` — Arrow-batched ``mapInPandas`` applies the learned
     merge ranks greedily per word, with a per-batch word cache (real
     corpora repeat words heavily, so the cache turns per-token work into
     per-distinct-word work).

No per-row Python outside the vectorized encode UDF; the fit itself never
scans the corpus more than once.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"  # end-of-word marker, standard BPE


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word histogram (lower + whitespace split — the same
    normalization as the rest of the text stack): one shuffle, output is
    vocabulary-sized."""
    words = F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                              r"\s+")).alias("word")
    return (df.where(F.col(text_col).isNotNull())
            .select(words).where(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq")))


def fit_bpe(word_freqs: DataFrame, n_merges: int = 1000,
            collect_threshold: int = 2_000_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-frequency relation.

    Collects the histogram (bounded: raises above ``collect_threshold``
    rows — cap the vocab upstream with a frequency floor if it trips) and
    runs the classic pair-count/merge loop driver-side. Deterministic:
    best pair = (max total count, then lexicographically smallest pair).
    """
    rows = word_freqs.select("word", "freq") \
        .limit(collect_threshold + 1).collect()
    if len(rows) > collect_threshold:
        raise ValueError(
            f"vocabulary exceeds collect_threshold={collect_threshold}; "
            "filter low-frequency words first (e.g. freq >= 2)")
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(r["freq"])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + freq
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1
                        and sym[i] == best[0] and sym[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def bpe_segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedily apply merges (lowest rank first) to one word — the
    reference per-word encoder shared by the UDF and the tests."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def encode_bpe(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize every document with the learned merges: Arrow-batched, one
    map-only pass, per-batch distinct-word cache. Output column is
    ``array<string>`` of BPE symbols (map symbols to ids with a broadcast
    vocab join if integer ids are needed)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                got = cache[word] = bpe_segment_word(word, ranks)
            return got

        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                if text is None:
                    toks.append(None)
                    continue
                out: list[str] = []
                for w in text.strip().lower().split():
                    out.extend(seg(w))
                toks.append(out)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    schema = f"{id_col} long, {out_col} array<string>"
    return df.select(id_col, text_col).mapInPandas(enc, schema=schema)


def bpe_vocab(encoded: DataFrame,
              tokens_col: str = "bpe_tokens") -> DataFrame:
    """Deterministic symbol->id table from an encoded corpus: ids are
    assigned by (frequency desc, symbol asc) — reproducible under any
    partitioning. Vocabulary-sized output (one aggregation)."""
    from pyspark.sql import Window as W
    counts = (encoded.select(F.explode(tokens_col).alias("symbol"))
              .groupBy("symbol").agg(F.count("*").alias("freq")))
    w = W.orderBy(F.col("freq").desc(), F.col("symbol").asc())
    # the vocab is bounded (symbols <= base chars + n_merges), so the
    # single-partition ranking window is fine here — never on corpus data
    return counts.withColumn(
        "token_id", (F.row_number().over(w) - 1).cast("int"))


def tokenized_table(docs: DataFrame, merges: list[tuple[str, str]],
                    vocab: DataFrame | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    source_col: str = "source") -> DataFrame:
    """Produce the engine's canonical input shape from raw text:
    ``(doc_id, tokens array<int>, n_tok int, source)`` — the table every
    PIT/feature operator downstream consumes.

    Pure JVM id-mapping: positional explode of the BPE symbols, broadcast
    join against the (vocabulary-sized) symbol table, ordered re-assembly
    via ``array_sort(collect_list(struct(pos, id)))`` — one shuffle on the
    doc id. Unknown symbols (possible when ``vocab`` was fitted on another
    corpus) fail fast rather than silently dropping tokens.
    """
    enc = encode_bpe(docs, merges, text_col, id_col)
    if vocab is None:
        vocab = bpe_vocab(enc)
    exploded = enc.select(
        F.col(id_col), F.posexplode("bpe_tokens").alias("pos", "symbol"))
    mapped = (exploded.join(F.broadcast(vocab.select("symbol", "token_id")),
                            "symbol", "left")
              .withColumn("token_id", F.when(
                  F.col("token_id").isNotNull(), F.col("token_id"))
                  .otherwise(F.raise_error(F.concat(
                      F.lit("tokenized_table: symbol missing from vocab: "),
                      F.col("symbol"))))))
    assembled = (mapped.groupBy(id_col)
                 .agg(F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("pos", "token_id"))),
                     lambda s: s["token_id"]).alias("tokens")))
    src = (docs.select(id_col, F.col(source_col))
           if source_col in docs.columns
           else docs.select(id_col, F.lit("default").alias(source_col)))
    return (assembled.join(src, id_col)
            .select(id_col, "tokens",
                    F.size("tokens").cast("int").alias("n_tok"),
                    source_col))

"""Byte-pair-encoding tokenizer: fit on a corpus, encode documents.

The industry-standard split of work (how real BPE trainers scale):
  1. ``word_frequencies`` — ONE distributed shuffle reduces the corpus to
     its distinct-word histogram (vocabulary-sized, e.g. ~10^6 rows for
     10^12 tokens of text);
  2. ``fit_bpe`` — the merge loop runs DRIVER-side over that bounded
     histogram (like the IVF centroid fit: the input is small by
     construction, collected under an explicit cap). INCREMENTAL, the
     subword-nmt algorithm: pair counts plus a pair->words inverted index
     are maintained across merges, so each merge touches only the words
     that actually contain the merged pair instead of rescanning the whole
     histogram, with a lazy max-heap for best-pair selection (stale
     entries are push-on-change and validated against the live count on
     pop).  Micro-bench (this box, 100k-word random histogram, 5k
     merges): 21.9 s incremental vs 1332 s extrapolated for the rescan
     reference (61×); 5.6× already at 1k words × 200 merges.  Deterministic:
     merge choice breaks count ties lexicographically, and all bookkeeping
     is commutative integer sums, so the result is partition-invariant.
  3. ``encode_bpe`` — Arrow-batched ``mapInPandas`` applies the learned
     merge ranks greedily per word, with a per-batch word cache (real
     corpora repeat words heavily, so the cache turns per-token work into
     per-distinct-word work).

No per-row Python outside the vectorized encode UDF; the fit itself never
scans the corpus more than once.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"  # end-of-word marker, standard BPE

# Word boundaries MUST agree between the fit histogram (Java regex \s+,
# which is ASCII-only by default) and the Python encode UDF (str.split()
# would use the wider Unicode whitespace set).  Both sides therefore split
# on ASCII \s+ explicitly, so e.g. NBSP-joined words segment identically
# at fit and encode time.
_WS_ASCII = re.compile(r"\s+", re.ASCII)


def _split_words(text: str) -> list[str]:
    """The encode-side word splitter — ASCII \\s+, matching
    ``word_frequencies``'s Java-regex split exactly."""
    return [w for w in _WS_ASCII.split(text.lower()) if w]


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word histogram (lower + ASCII-whitespace split — the same
    normalization as the rest of the text stack): one shuffle, output is
    vocabulary-sized."""
    words = F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                              r"\s+")).alias("word")
    return (df.where(F.col(text_col).isNotNull())
            .select(words).where(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq")))


def _collect_histogram(word_freqs: DataFrame,
                       collect_threshold: int) -> dict[tuple[str, ...], int]:
    """Collect the (bounded) word histogram as {symbol-tuple: freq}."""
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
    return vocab


def fit_bpe(word_freqs: DataFrame, n_merges: int = 1000,
            collect_threshold: int = 2_000_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-frequency relation.

    Collects the histogram (bounded: raises above ``collect_threshold``
    rows — cap the vocab upstream with a frequency floor if it trips) and
    runs the incremental pair-count/merge loop driver-side (see module
    docstring). Deterministic: best pair = (max total count, then
    lexicographically smallest pair); verified merge-identical to the
    naive full-rescan reference in ``tests/test_bpe.py``.
    """
    hist = _collect_histogram(word_freqs, collect_threshold)
    words: list[list[str]] = []
    freqs: list[int] = []
    for sym, freq in hist.items():
        words.append(list(sym))
        freqs.append(freq)

    # pair -> total weighted count, and pair -> word indices that (at some
    # point) contained it.  The index is maintained lazily: a word index is
    # only guaranteed to be removed when its pair is merged; stale entries
    # cost a no-op subtract/re-add, never a wrong count.
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (sym, freq) in enumerate(zip(words, freqs)):
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + freq
            where.setdefault(p, set()).add(wi)

    # Lazy max-heap over (-count, pair): every count CHANGE pushes a fresh
    # entry; a popped entry is valid only if it matches the live dict, so
    # stale entries are discarded on pop.  Heap order (-count, pair) is
    # exactly the deterministic (count desc, pair asc) selection rule, and
    # a heap pop is the multiset minimum, so the merge sequence is
    # independent of push order (and hence of PYTHONHASHSEED / partitioning).
    import heapq
    heap: list[tuple[int, tuple[str, str]]] = \
        [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pair = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -negc:
                pair = p
                break
        if pair is None:
            break
        merges.append(pair)
        a, b = pair
        merged = a + b
        changed: set[tuple[str, str]] = set()
        for wi in where.pop(pair, ()):  # set order irrelevant: sums commute
            sym = words[wi]
            freq = freqs[wi]
            # subtract every pair of the old word, rewrite, re-add
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                c = pair_counts[p] - freq
                changed.add(p)
                if c:
                    pair_counts[p] = c
                else:
                    del pair_counts[p]
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + freq
                changed.add(p)
                where.setdefault(p, set()).add(wi)
        pair_counts.pop(pair, None)
        changed.discard(pair)
        for p in changed:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
    return merges


def _fit_bpe_rescan(word_freqs: DataFrame, n_merges: int = 1000,
                    collect_threshold: int = 2_000_000
                    ) -> list[tuple[str, str]]:
    """Naive full-rescan reference implementation (O(histogram) PER merge).
    Kept only as the equivalence oracle for ``fit_bpe`` in tests and for
    the micro-bench note in the module docstring — never call on real
    corpora."""
    vocab = _collect_histogram(word_freqs, collect_threshold)
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
    ``array<string>`` of BPE symbols (use ``tokenized_table`` when integer
    ids are needed — it maps symbol->id inside the same Arrow pass). The
    id column keeps its input type."""
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
                for w in _split_words(text):
                    out.extend(seg(w))
                toks.append(out)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<string>"
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


def bpe_vocab_from_histogram(word_freqs: DataFrame,
                             merges: list[tuple[str, str]],
                             collect_threshold: int = 2_000_000
                             ) -> list[tuple[str, int, int]]:
    """Driver-side ``(symbol, freq, token_id)`` vocab derived from the
    word HISTOGRAM instead of a second corpus scan: every corpus token is
    some segmented word's symbol, so symbol frequency equals
    sum(word_freq × occurrences in the word's segmentation). Identical
    output to ``bpe_vocab(encode_bpe(corpus, merges))`` — same ids, since
    the id order (freq desc, symbol asc) sees the same totals — at
    vocabulary cost rather than corpus cost."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    sym_freq: dict[str, int] = {}
    for sym, freq in _collect_histogram(word_freqs, collect_threshold).items():
        word = "".join(sym[:-1])  # strip the _EOW sentinel appended above
        for s in bpe_segment_word(word, ranks):
            sym_freq[s] = sym_freq.get(s, 0) + freq
    ordered = sorted(sym_freq.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(s, f, i) for i, (s, f) in enumerate(ordered)]


def tokenized_table(docs: DataFrame, merges: list[tuple[str, str]],
                    vocab: DataFrame | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    source_col: str = "source",
                    collect_threshold: int = 2_000_000) -> DataFrame:
    """Produce the engine's canonical input shape from raw text:
    ``(doc_id, tokens array<int>, n_tok int, source)`` — the table every
    PIT/feature operator downstream consumes.

    ONE map-only Arrow pass over the corpus: the symbol->id vocabulary is
    broadcast into the encode UDF as a plain dict (it is bounded by base
    chars + n_merges), so there is no token-granularity explode/shuffle
    and no doc-id reassembly join — the plan has zero exchanges on corpus
    rows.  With ``vocab=None`` the vocabulary is derived driver-side from
    the word histogram (one vocabulary-sized aggregation, see
    ``bpe_vocab_from_histogram``) rather than by encoding the corpus
    twice.  Unknown symbols (possible when ``vocab`` was fitted on another
    corpus) fail fast rather than silently dropping tokens.  Docs with
    null/empty/whitespace-only text are KEPT, with ``tokens = []`` and
    ``n_tok = 0`` (the r3 shuffle-based version silently dropped them).
    """
    import pandas as pd

    if vocab is None:
        sym_to_id = {s: i for s, _f, i in bpe_vocab_from_histogram(
            word_frequencies(docs, text_col), merges, collect_threshold)}
    else:
        sym_to_id = {r["symbol"]: int(r["token_id"])
                     for r in vocab.select("symbol", "token_id").collect()}

    ranks = {pair: i for i, pair in enumerate(merges)}
    has_source = source_col in docs.columns
    cols = [id_col, text_col] + ([source_col] if has_source else [])

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[int]] = {}

        def seg_ids(word: str) -> list[int]:
            got = cache.get(word)
            if got is None:
                ids = []
                for s in bpe_segment_word(word, ranks):
                    tid = sym_to_id.get(s)
                    if tid is None:
                        raise ValueError(
                            f"tokenized_table: symbol missing from vocab: "
                            f"{s!r}")
                    ids.append(tid)
                got = cache[word] = ids
            return got

        for pdf in batches:
            toks: list[list[int]] = []
            for text in pdf[text_col]:
                if text is None:
                    toks.append([])
                    continue
                out: list[int] = []
                for w in _split_words(text):
                    out.extend(seg_ids(w))
                toks.append(out)
            src = (pdf[source_col] if has_source
                   else pd.Series(["default"] * len(pdf)))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "tokens": toks,
                "n_tok": pd.Series([len(t) for t in toks], dtype="int32"),
                source_col: src,
            })

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = (f"{id_col} {id_type}, tokens array<int>, n_tok int, "
              f"{source_col} string")
    return docs.select(*cols).mapInPandas(enc, schema=schema)

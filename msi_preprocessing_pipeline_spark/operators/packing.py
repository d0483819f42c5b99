"""Training-sequence packing: concat documents and chunk into fixed-size
token windows (the standard "concat-and-chunk" LLM pretraining layout).

Semantics: documents are laid out in a deterministic global order —
(bucket, doc_id), where ``bucket`` is an md5-band of the doc id — and the
concatenated token stream is cut every ``budget`` tokens. A document may
straddle a window boundary (that IS concat-and-chunk; packing without
splitting is a different policy). The layout is a pure function of the
data: invariant to partitioning, ordering, cluster size, and engine.

Scale shape: the assignment table is one window cumsum per bucket (shuffle
on bucket; 256 md5 bands bound the window state and parallelize the
sort), and materialization explodes each doc into its per-window fragments
(JVM ``slice``) and reassembles windows with an order-keyed flatten — no
driver involvement, no skew beyond the bounded bucket fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket(id_col) -> "F.Column":
    # 256 deterministic layout lanes; md5 so DuckDB/python reproduce exactly
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)


def _with_assignments(df: DataFrame, budget: int, id_col: str,
                      len_col: str) -> DataFrame:
    """Append the layout columns (bucket, start_offset, first/last window,
    in-window offset) — one window cumsum per bucket, all other columns
    carried through (so the materializer needs NO second join/shuffle)."""
    w = Window.partitionBy("bucket").orderBy(id_col)
    start_raw = F.sum(len_col).over(w) - F.col(len_col)
    return (df.withColumn("bucket", _bucket(id_col))
            .withColumn("start_offset", start_raw.cast("long"))
            .withColumn("first_seq",
                        (F.col("start_offset") / budget).cast("long"))
            # empty docs (len 0) occupy their start window; greatest() also
            # keeps the floor-division cast non-negative-safe
            .withColumn("last_seq",
                        ((F.col("start_offset")
                          + F.greatest(F.col(len_col), F.lit(1)) - 1)
                         / budget).cast("long"))
            .withColumn("offset_in_seq",
                        F.pmod(F.col("start_offset"),
                               F.lit(budget)).cast("long")))


def pack_assignments(df: DataFrame, budget: int, id_col: str = "doc_id",
                     len_col: str = "n_tok") -> DataFrame:
    """Where each document lands: its bucket, global start offset within the
    bucket's token stream, and the first/last window indices it touches."""
    return _with_assignments(df, budget, id_col, len_col).select(
        F.col(id_col), "bucket", F.col(len_col).cast("long").alias("n_tok"),
        "start_offset", "first_seq", "last_seq", "offset_in_seq")


def pack_token_sequences(df: DataFrame, budget: int, id_col: str = "doc_id",
                         tokens_col: str = "tokens",
                         len_col: str = "n_tok") -> DataFrame:
    """Materialized training windows: one row per (bucket, seq_no) with the
    packed ``budget``-token array (the bucket's tail window may be short).

    Plan: assignment columns computed inline (ONE shuffle, on bucket) →
    explode each doc into its per-window fragments (``slice`` on the token
    array, pure JVM) → groupBy window → order-keyed reassembly
    (``array_sort`` on (offset, fragment) structs → ``flatten``)."""
    asg = _with_assignments(df, budget, id_col, len_col) \
        .withColumn("n_tok", F.col(len_col).cast("long"))
    seqs = F.sequence(F.col("first_seq"), F.col("last_seq"))
    frag = asg.select(
        "bucket", F.col(id_col), "start_offset", "n_tok", tokens_col,
        F.explode(seqs).alias("seq_no"))
    # fragment of this doc inside window seq_no:
    #   window span  [seq_no*budget, (seq_no+1)*budget)
    #   doc span     [start_offset, start_offset + n_tok)
    frag_start = F.greatest(F.col("seq_no") * budget, F.col("start_offset"))
    frag_end = F.least((F.col("seq_no") + 1) * F.lit(budget),
                       F.col("start_offset") + F.col("n_tok"))
    frag = frag.select(
        "bucket", "seq_no",
        frag_start.alias("pos"),
        F.slice(tokens_col,
                (frag_start - F.col("start_offset") + 1).cast("int"),
                (frag_end - frag_start).cast("int")).alias("frag"))
    reassembled = (frag.groupBy("bucket", "seq_no")
                   .agg(F.flatten(F.array_sort(F.collect_list(
                       F.struct(F.col("pos"), F.col("frag"))))
                       .getField("frag")).alias("tokens")))
    return reassembled.select("bucket", "seq_no", "tokens",
                              F.size("tokens").alias("n_tok"))


def chunk_tokens(df: DataFrame, chunk_len: int, stride: int | None = None,
                 min_len: int = 1, tokens_col: str = "tokens",
                 id_col: str = "doc_id", keep_cols=()) -> DataFrame:
    """Per-document sliding-window chunking: cut each token array into
    windows of ``chunk_len`` tokens starting every ``stride`` positions
    (default ``stride = chunk_len`` — disjoint chunks; ``stride <
    chunk_len`` overlaps them, the usual long-document training layout).

    Emits ``(id, chunk_id, chunk_tokens, chunk_n, *keep_cols)`` with
    ``chunk_id`` the 0-based window index.  The tail window is short
    when the document length is not stride-aligned; windows shorter
    than ``min_len`` are dropped (set ``min_len=1`` to keep every
    non-empty tail).  Empty / null token arrays emit no chunks.

    Unlike :func:`pack_sequences` (cross-document concat-and-chunk),
    chunking is per-row: a pure JVM ``sequence → posexplode → slice``
    projection — NO shuffle, no Python, linear in input tokens.  At
    10^12 sequences this is a map-only pass Catalyst pipelines into
    the scan.
    """
    if chunk_len < 1:
        raise ValueError(f"chunk_len must be >= 1, got {chunk_len}")
    stride = chunk_len if stride is None else stride
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    n = F.size(F.col(tokens_col))  # -1 for null arrays
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    out = (df.select(F.col(id_col), F.col(tokens_col),
                     *[F.col(c) for c in keep_cols],
                     F.posexplode(starts).alias("chunk_id", "__start"))
           .select(F.col(id_col), F.col("chunk_id"),
                   F.slice(F.col(tokens_col), F.col("__start") + 1,
                           chunk_len).alias("chunk_tokens"),
                   *[F.col(c) for c in keep_cols]))
    return (out.withColumn("chunk_n", F.size("chunk_tokens"))
            .where(F.col("chunk_n") >= min_len))


def packing_stats(df: DataFrame, budget: int, id_col: str = "doc_id",
                  len_col: str = "n_tok") -> DataFrame:
    """One-row packing-efficiency report for a token budget: how much of
    every materialized training window is real tokens (concat-and-chunk
    packing) vs the naive one-doc-per-row padding baseline.

    Output: ``(n_docs, total_tokens, budget, n_windows, packed_efficiency,
    n_truncated_docs, naive_rows, naive_efficiency)``.

    * ``n_windows`` — windows :func:`pack_token_sequences` materializes:
      per layout bucket, ``ceil(stream_len / budget)`` (empty buckets 0).
    * ``packed_efficiency = total_tokens / (n_windows·budget)``.
    * naive baseline: one doc per row, padded/truncated to ``budget`` —
      ``naive_efficiency = Σ min(len, budget) / (n_docs·budget)``, with
      ``n_truncated_docs`` counting the docs that would LOSE tokens.

    All counts exact int64/decimal; each efficiency is one division of
    exact ints. One map-side-combined aggregation over the corpus plus a
    |buckets|-bounded (≤256) reduction — strictly cheaper than packing.
    """
    lens = df.select(F.col(len_col).cast("long").alias("__len"),
                     _bucket(id_col).alias("bucket"))
    per_bucket = (lens.groupBy("bucket")
                  .agg(F.sum("__len").alias("__stream"),
                       F.count("*").alias("__n"),
                       F.sum(F.least(F.col("__len"), F.lit(int(budget))))
                       .alias("__kept"),
                       F.sum(F.when(F.col("__len") > int(budget), 1)
                             .otherwise(0)).alias("__trunc")))
    # integral `div`, not float `/`: a bucket stream of 10^12 docs × 10^4
    # tokens exceeds 2^53, where double division would silently round
    win = F.expr(f"(__stream + {int(budget) - 1}) div {int(budget)}")
    agg = per_bucket.agg(
        F.sum("__n").alias("n_docs"),
        F.sum("__stream").cast("long").alias("total_tokens"),
        F.sum(win).cast("long").alias("n_windows"),
        F.sum("__kept").cast("long").alias("__kept_all"),
        F.sum("__trunc").cast("long").alias("n_truncated_docs"))
    nw = F.col("n_windows").cast("double")
    nd = F.col("n_docs").cast("double")
    return agg.select(
        "n_docs", "total_tokens", F.lit(int(budget)).alias("budget"),
        "n_windows",
        F.when(F.col("n_windows") > 0,
               F.col("total_tokens").cast("double")
               / (nw * F.lit(float(budget)))).alias("packed_efficiency"),
        "n_truncated_docs",
        F.col("n_docs").alias("naive_rows"),
        F.when(F.col("n_docs") > 0,
               F.col("__kept_all").cast("double")
               / (nd * F.lit(float(budget)))).alias("naive_efficiency"))


def pack_with_segments(df: DataFrame, budget: int, id_col: str = "doc_id",
                       tokens_col: str = "tokens",
                       len_col: str = "n_tok") -> DataFrame:
    """:func:`pack_token_sequences` plus the two arrays a trainer needs
    to keep cross-document attention OFF inside a packed window:

    * ``segment_ids`` — for every packed token, the 1-based ordinal of
      its source document WITHIN the window (block-diagonal attention
      mask key);
    * ``position_ids`` — its 0-based position within its source
      document (rotary/absolute positions restart at every doc
      boundary, including for fragments of a straddling doc, whose
      continuation window resumes at the fragment's in-doc offset).

    Output: ``(bucket, seq_no, tokens, segment_ids, position_ids,
    n_tok, n_segments)`` — ``n_segments`` counts docs contributing >= 1
    token (empty docs occupy layout space but get no segment ordinal).

    Plan shape: identical to :func:`pack_token_sequences` — ONE shuffle
    on the 256-lane layout bucket for the cumsum, one explode into
    per-window fragments, one groupBy reassembly; the two extra arrays
    are pure JVM higher-order expressions over the sorted fragment
    structs (no Python, no extra Exchange).
    """
    asg = _with_assignments(df, budget, id_col, len_col) \
        .withColumn("n_tok", F.col(len_col).cast("long"))
    seqs = F.sequence(F.col("first_seq"), F.col("last_seq"))
    frag = asg.select(
        "bucket", F.col(id_col), "start_offset", "n_tok", tokens_col,
        F.explode(seqs).alias("seq_no"))
    frag_start = F.greatest(F.col("seq_no") * budget, F.col("start_offset"))
    frag_end = F.least((F.col("seq_no") + 1) * F.lit(budget),
                       F.col("start_offset") + F.col("n_tok"))
    frag = frag.select(
        "bucket", "seq_no",
        frag_start.alias("pos"),
        (frag_start - F.col("start_offset")).alias("loc"),
        F.slice(tokens_col,
                (frag_start - F.col("start_offset") + 1).cast("int"),
                (frag_end - frag_start).cast("int")).alias("frag"))
    out = (frag.groupBy("bucket", "seq_no")
           .agg(F.array_sort(F.collect_list(
               F.struct(F.col("pos"), F.col("loc"), F.col("frag"))))
               .alias("__sorted")))
    # fragments sort by global stream position (pos is unique within a
    # window); zero-token fragments (empty docs) are layout-only
    ne = F.filter(F.col("__sorted"), lambda s: F.size(s["frag"]) > 0)
    return out.select(
        "bucket", "seq_no",
        F.flatten(F.transform(ne, lambda s: s["frag"])).alias("tokens"),
        F.flatten(F.transform(
            ne, lambda s, i: F.array_repeat((i + 1).cast("int"),
                                            F.size(s["frag"]))))
        .alias("segment_ids"),
        F.flatten(F.transform(
            ne, lambda s: F.transform(
                s["frag"], lambda _t, j: (s["loc"] + j).cast("int"))))
        .alias("position_ids"),
        F.size(F.flatten(F.transform(ne, lambda s: s["frag"])))
        .cast("long").alias("n_tok"),
        F.size(ne).cast("long").alias("n_segments"))


def length_bucket_batches(df: DataFrame, batch_tokens: int,
                          min_bucket: int = 16, max_bucket: int = 4096,
                          id_col: str = "doc_id",
                          len_col: str = "n_tok",
                          seed: int = 0) -> DataFrame:
    """Dynamic-batching plan (the fairseq / HF ``group_by_length``
    recipe): each document pads to the smallest power-of-two bucket ≥
    its length (floored at ``min_bucket``, capped at ``max_bucket`` —
    longer docs flag ``truncated``), and each bucket's docs form
    batches of ``batch_tokens // bucket`` rows in a deterministic
    md5-shuffled order (the ``curriculum_keys`` draw), so batch shapes
    are fixed per bucket and pad waste is bounded by <2× instead of
    pad-to-global-max.

    Exactness: the bucket is ``1 << length(bin(n-1))`` — the binary-
    string-length trick, exact integer arithmetic in both engines
    (``log2``-based rounding can misround at exact powers of two) —
    and every derived column is integer, so the whole plan carries an
    exact SQL oracle.  Output per doc: ``(id, n_tok, bucket,
    batch_in_bucket, pos_in_batch, pad, truncated)``.

    Scale shape: ONE hash exchange on the bucket key + a per-bucket
    rank window — a giant bucket costs its sort, never memory; the
    md5 draw makes the batch composition partition-, engine-, and
    rerun-invariant.
    """
    if batch_tokens < max_bucket:
        raise ValueError(
            f"batch_tokens={batch_tokens} must be >= max_bucket="
            f"{max_bucket} (the top bucket must fit one doc per batch)")
    for name, v in (("min_bucket", min_bucket),
                    ("max_bucket", max_bucket)):
        if v < 1 or v & (v - 1):
            raise ValueError(f"{name} must be a power of two, got {v}")
    from pyspark.sql import Window

    n = F.coalesce(F.col(len_col).cast("long"), F.lit(0))
    raw = F.expr(
        "shiftleft(cast(1 as bigint), "
        "cast(length(bin(greatest(n_tok, 2) - 1)) as int))")
    bucket = F.least(F.greatest(raw, F.lit(min_bucket).cast("long")),
                     F.lit(max_bucket).cast("long"))
    d = (df.select(F.col(id_col), n.alias("n_tok"))
         .withColumn("bucket", bucket)
         .withColumn("truncated", (F.col("n_tok") > F.col("bucket"))))
    dpb = F.expr(f"cast({int(batch_tokens)} as bigint) div bucket")
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                          F.lit(str(seed))))
    w = Window.partitionBy("bucket").orderBy(h.asc(),
                                             F.col(id_col).asc())
    rk = F.row_number().over(w) - 1
    return (d.withColumn("__rk", rk.cast("long"))
            .withColumn("__dpb", dpb)
            .select(
                id_col, "n_tok", "bucket",
                F.expr("__rk div __dpb").cast("long")
                .alias("batch_in_bucket"),
                (F.col("__rk") % F.col("__dpb")).cast("long")
                .alias("pos_in_batch"),
                (F.col("bucket")
                 - F.least(F.col("n_tok"), F.col("bucket")))
                .cast("long").alias("pad"),
                "truncated"))

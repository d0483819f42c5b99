"""Token-sequence augmentation for LLM pretraining: fill-in-the-middle
(FIM) reordering and deterministic span corruption.

Both transforms are PURE MAP-ONLY JVM projections (md5-derived cut
points + ``slice``/``concat`` on the token arrays — zero Exchange, zero
Python), so at 100 TB they pipeline into the scan and cost one pass.
Randomness is the engine's md5 idiom (``functions.util.md5_bucket``):
the transform of a row is a pure function of its id — reproducible
across runs, partitionings, engines (DuckDB mirrors the arithmetic
exactly), and resumable without a stored RNG state.

FIM (Bavarian et al. 2022, "Efficient Training of Language Models to
Fill in the Middle"): with probability ``rate_pct``/100 a document's
token array is split at two md5-drawn cut points into
(prefix, middle, suffix) and re-emitted as

    PSM:  [PRE] prefix [SUF] suffix [MID] middle
    SPM:  [PRE] [SUF] suffix [MID] prefix middle

with sentinel token ids just above the vocabulary. Unselected (and
empty/null) documents pass through unchanged, so the output column is a
drop-in replacement for the training token stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.util import md5_bucket


def _arr(*ids: Column | int) -> Column:
    return F.array(*[x if isinstance(x, Column) else F.lit(int(x))
                     for x in ids]).cast("array<int>")


def fim_transform(df: DataFrame, vocab_size: int = 4096,
                  rate_pct: int = 50, mode: str = "psm",
                  id_col: str = "doc_id", tokens_col: str = "tokens",
                  out_col: str = "fim_tokens",
                  seed: int = 7) -> DataFrame:
    """Appends ``(fim_applied, out_col)``: the FIM-reordered token array
    for the md5-selected ``rate_pct`` percent of documents, the original
    array for the rest.

    Sentinels: ``[PRE] = vocab_size``, ``[SUF] = vocab_size + 1``,
    ``[MID] = vocab_size + 2`` — callers size their embedding table
    ``vocab_size + 3``.

    Cut points: ``c1 = md5(id:fim1:seed) % (n+1)`` then
    ``c2 = c1 + md5(id:fim2:seed) % (n - c1 + 1)`` — every (c1, c2) with
    ``0 <= c1 <= c2 <= n`` is reachable and the draw is a pure function
    of the document id. Documents with fewer than 2 tokens (or null
    arrays) are never selected: there is no middle to infill.

    Scale shape: map-only (two md5 expressions + three ``slice``s + one
    ``concat`` per row) — no Exchange, no Python; output length is
    ``n + 3`` for selected rows (the three sentinels), so the token
    stream grows by at most ``3·rate_pct`` percent of a token per doc.
    """
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")
    if not 0 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be in [0, 100], got {rate_pct}")
    toks = F.col(tokens_col)
    n = F.size(toks)
    sid = F.col(id_col).cast("string")
    sel = (md5_bucket(F.concat(sid, F.lit(f":fim0:{seed}")), 100)
           < rate_pct) & (n >= 2)
    c1 = md5_bucket(F.concat(sid, F.lit(f":fim1:{seed}")), n + 1)
    c2 = c1 + md5_bucket(F.concat(sid, F.lit(f":fim2:{seed}")),
                         n - c1 + 1)
    pre, suf, mid = vocab_size, vocab_size + 1, vocab_size + 2
    prefix = F.slice(toks, F.lit(1), c1.cast("int"))
    middle = F.slice(toks, (c1 + 1).cast("int"), (c2 - c1).cast("int"))
    suffix = F.slice(toks, (c2 + 1).cast("int"), (n - c2).cast("int"))
    if mode == "psm":
        fim = F.concat(_arr(pre), prefix, _arr(suf), suffix, _arr(mid),
                       middle)
    else:  # spm: joint prefix+middle completion after the suffix
        fim = F.concat(_arr(pre), _arr(suf), suffix, _arr(mid), prefix,
                       middle)
    return df.withColumn("fim_applied", F.coalesce(sel, F.lit(False))) \
             .withColumn(out_col,
                         F.when(F.col("fim_applied"), fim)
                         .otherwise(toks.cast("array<int>")))


def span_corrupt(df: DataFrame, vocab_size: int = 4096,
                 slot_len: int = 8, rate_pct: int = 40, max_span: int = 3,
                 max_sentinels: int = 100, id_col: str = "doc_id",
                 tokens_col: str = "tokens", seed: int = 7) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020): mask md5-drawn
    token spans with ORDINAL sentinel ids and emit the
    (``inputs``, ``targets``) pair —

        inputs:  tokens with each masked span replaced by <extra_id_k>
        targets: <extra_id_0> span0 <extra_id_1> span1 …

    Span placement is slotted so the draw stays a pure per-row function
    of the document id: the array is cut into ``slot_len``-token slots;
    slot ``i`` corrupts iff ``md5(id:sc0:i:seed) % 100 < rate_pct`` (and
    fewer than ``max_sentinels`` spans precede it), masking a span of
    1..``max_span`` tokens at an md5-drawn offset inside the slot.
    Spans can never overlap (one per slot), expected corruption is
    ``rate_pct·avg_span/slot_len`` of tokens, and the transform is
    reproducible across runs / partitionings / engines with no RNG
    state.  Sentinel ids are ``vocab_size + k`` for the k-th corrupted
    span — size the embedding table ``vocab_size + max_sentinels``.

    Scale shape: ONE sequential JVM ``aggregate`` (fold) over the slot
    inventory per row — map-only, O(slots) md5 draws, no Exchange, no
    Python.  The DuckDB mirror (:func:`span_corrupt_sql`) takes the
    opposite route — explode slots, a window ordinal, list reassembly —
    so the contract cross-checks two independent derivations.
    """
    if slot_len < 1 or max_span < 1 or max_span > slot_len:
        raise ValueError(f"need 1 <= max_span <= slot_len, got "
                         f"max_span={max_span}, slot_len={slot_len}")
    if not 0 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be in [0, 100], got {rate_pct}")
    toks = F.col(tokens_col).cast("array<int>")
    n = F.size(toks)
    sid = F.col(id_col).cast("string")

    def draw(tag: str, i: Column, mod: Column) -> Column:
        return md5_bucket(
            F.concat(sid, F.lit(f":{tag}:"), i.cast("string"),
                     F.lit(f":{seed}")), mod)

    n_slots = F.ceil(n / F.lit(slot_len)).cast("int")
    slots = F.when(n >= 1, F.sequence(F.lit(0), n_slots - 1)) \
        .otherwise(F.array().cast("array<int>"))

    def step(acc: Column, i: Column) -> Column:
        base = i * slot_len                       # slot = [base+1 .. base+sl]
        sl = F.least(n - base, F.lit(slot_len))   # tail slot may be short
        raw = draw("sc0", i, F.lit(100)) < F.lit(rate_pct)
        corrupt = raw & (acc.getField("k") < F.lit(max_sentinels))
        start = draw("sc1", i, sl)                # 0-based offset in slot
        span = (F.lit(1)
                + draw("sc2", i, F.least(F.lit(max_span), sl - start)))
        sent = F.array((F.lit(vocab_size) + acc.getField("k"))
                       .cast("int"))
        head = F.slice(toks, (base + 1).cast("int"), start.cast("int"))
        body = F.slice(toks, (base + start + 1).cast("int"),
                       span.cast("int"))
        tail = F.slice(toks, (base + start + span + 1).cast("int"),
                       (sl - start - span).cast("int"))
        full = F.slice(toks, (base + 1).cast("int"), sl.cast("int"))
        return F.struct(
            F.when(corrupt,
                   F.concat(acc.getField("inp"), head, sent, tail))
            .otherwise(F.concat(acc.getField("inp"), full)).alias("inp"),
            F.when(corrupt, F.concat(acc.getField("tgt"), sent, body))
            .otherwise(acc.getField("tgt")).alias("tgt"),
            F.when(corrupt, acc.getField("k") + 1)
            .otherwise(acc.getField("k")).alias("k"))

    empty = F.array().cast("array<int>")
    acc0 = F.struct(empty.alias("inp"), empty.alias("tgt"),
                    F.lit(0).alias("k"))
    folded = F.aggregate(slots, acc0, step)
    return (df.withColumn("__sc", folded)
            .withColumn("inputs", F.col("__sc.inp"))
            .withColumn("targets", F.col("__sc.tgt"))
            .withColumn("n_spans", F.col("__sc.k").cast("long"))
            .withColumn("n_masked",
                        (n - (F.size("inputs") - F.col("__sc.k")))
                        .cast("long"))
            .drop("__sc"))


def span_corrupt_sql(tok_cte: str, vocab_size: int = 4096,
                     slot_len: int = 8, rate_pct: int = 40,
                     max_span: int = 3, max_sentinels: int = 100,
                     seed: int = 7) -> str:
    """DuckDB mirror of :func:`span_corrupt` by the EXPLODED route:
    one row per slot, a window ordinal over raw-corrupt flags (the
    first ``max_sentinels`` raw-corrupt slots are exactly the capped
    set), per-slot fragments, and ordered list reassembly.  Emits a CTE
    chain ending in ``sc(doc_id, inputs, targets, n_spans, n_masked)``.
    """

    def bucket(tag: str, m: str) -> str:
        return (f"cast(('0x' || substr(md5(cast(doc_id as varchar) || "
                f"':{tag}:' || cast(i as varchar) || ':{seed}'), 1, 8)) "
                f"as bigint) % ({m})")

    return f"""
        slotted as (
            select doc_id, tokens, len(tokens) as n,
                   unnest(range(0, cast(ceil(len(tokens)
                                 / {slot_len}.0) as int))) as i
            from {tok_cte} where len(tokens) >= 1
        ), drawn as (
            select *, i * {slot_len} as base,
                   least(n - i * {slot_len}, {slot_len}) as sl,
                   ({bucket('sc0', '100')} < {rate_pct}) as raw
            from slotted
        ), capped as (
            select *,
                   coalesce(cast(sum(case when raw then 1 else 0 end)
                        over (partition by doc_id order by i
                              rows between unbounded preceding
                              and 1 preceding) as int), 0) as prior_raw
            from drawn
        ), frag as (
            select doc_id, i, n, sl,
                   (raw and prior_raw < {max_sentinels}) as corrupt,
                   {bucket('sc1', 'sl')} as start,
                   1 + {bucket('sc2',
                               f'least({max_span}, sl - ({bucket("sc1", "sl")}))')}
                       as span,
                   prior_raw, tokens, base
            from capped
        ), pieces as (
            select doc_id, i, n, corrupt,
                   case when corrupt then
                       tokens[base + 1 : base + start]
                       || [{vocab_size} + prior_raw]
                       || tokens[base + start + span + 1 : base + sl]
                   else tokens[base + 1 : base + sl] end as inp_frag,
                   case when corrupt then
                       [{vocab_size} + prior_raw]
                       || tokens[base + start + 1 : base + start + span]
                   else [] end as tgt_frag,
                   case when corrupt then span else 0 end as masked
            from frag
        ), agg as (
            select doc_id,
                   flatten(list(inp_frag order by i)) as inputs,
                   flatten(list(tgt_frag order by i)) as targets,
                   cast(sum(case when corrupt then 1 else 0 end)
                        as bigint) as n_spans,
                   cast(sum(masked) as bigint) as n_masked
            from pieces group by doc_id
        ), sc as (
            select t.doc_id,
                   coalesce(a.inputs, []) as inputs,
                   coalesce(a.targets, []) as targets,
                   coalesce(a.n_spans, 0) as n_spans,
                   coalesce(a.n_masked, 0) as n_masked
            from {tok_cte} t left join agg a using (doc_id)
        )
    """


def fim_sql(tok_cte: str, vocab_size: int = 4096, rate_pct: int = 50,
            mode: str = "psm", seed: int = 7) -> str:
    """DuckDB mirror of :func:`fim_transform` over a CTE exposing
    ``(doc_id, tokens)`` — same md5 draws, same slice arithmetic.
    Emits a CTE chain ending in ``fim(doc_id, fim_applied, fim_tokens)``
    for the caller's terminal select."""
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be 'psm' or 'spm', got {mode!r}")

    def bucket(tag: str, m: str) -> str:
        return (f"cast(('0x' || substr(md5(cast(doc_id as varchar) || "
                f"':{tag}:{seed}'), 1, 8)) as bigint) % ({m})")

    pre, suf, mid = vocab_size, vocab_size + 1, vocab_size + 2
    body = (f"[{pre}] || prefix || [{suf}] || suffix || [{mid}] || middle"
            if mode == "psm" else
            f"[{pre}] || [{suf}] || suffix || [{mid}] || prefix || middle")
    return f"""
        cuts as (
            select doc_id, tokens, len(tokens) as n,
                   coalesce({bucket('fim0', '100')} < {rate_pct}
                            and len(tokens) >= 2, false) as fim_applied,
                   {bucket('fim1', 'len(tokens) + 1')} as c1
            from {tok_cte}
        ), cuts2 as (
            select *, c1 + {bucket('fim2', 'n - c1 + 1')} as c2 from cuts
        ), parts as (
            select doc_id, tokens, fim_applied,
                   tokens[1 : c1] as prefix,
                   tokens[c1 + 1 : c2] as middle,
                   tokens[c2 + 1 : n] as suffix
            from cuts2
        ), fim as (
            select doc_id, fim_applied,
                   case when fim_applied then {body}
                        else tokens end as fim_tokens
            from parts
        )
    """


def loss_mask(df: DataFrame, sep_id: int, tokens_col: str = "tokens",
              out_col: str = "mask") -> DataFrame:
    """Instruction-tuning loss mask: tokens up to and INCLUDING the
    first ``sep_id`` occurrence are prompt (mask 0 — no loss), the rest
    are completion (mask 1).  Documents without the separator train on
    every token (pure pretraining rows mix freely with instruction
    rows), so ``n_prompt = 0`` there; null arrays stay null with zero
    counts.

    Appends ``(out_col array<int>, n_prompt long, n_target long)``.

    Scale shape: pure map-only JVM — one ``array_position`` + one
    indexed ``transform`` per row, no Exchange, no Python; Catalyst
    pipelines it into the scan like the FIM/span-corruption transforms
    above.
    """
    toks = F.col(tokens_col)
    p = F.array_position(toks, F.lit(int(sep_id)))  # 0 when absent
    mask = F.transform(
        toks, lambda _t, i: F.when(i + 1 <= p, 0).otherwise(1)
        .cast("int"))
    return (df.withColumn(out_col, mask)
            .withColumn("n_prompt",
                        F.coalesce(p, F.lit(0)).cast("long"))
            .withColumn(
                "n_target",
                F.coalesce(F.size(toks) - p, F.lit(0)).cast("long")))

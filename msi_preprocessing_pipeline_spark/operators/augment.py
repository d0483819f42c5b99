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

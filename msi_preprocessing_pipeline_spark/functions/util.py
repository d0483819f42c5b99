"""Tiny shared helpers for operator argument normalization."""

from __future__ import annotations


def as_list(x) -> list:
    """Normalize a column-name argument: string -> [string], any sequence
    -> list. ``None`` raises TypeError (matching ``list(None)``) — callers
    that accept an optional argument must handle None themselves, so a
    required key like ``asof_join(on=...)`` can never silently become an
    unpartitioned global window."""
    return [x] if isinstance(x, str) else list(x)


def md5_bucket(key, n):
    """The engine-portable hash-bucket idiom shared by every
    deterministic-sampling/hashing operator: first 8 hex chars of
    ``md5(key)`` as an integer, modulo ``n`` — the same integer in
    Spark, DuckDB (``cast(('0x' || substr(md5(k),1,8)) as bigint) %
    n``) and Python (``int(md5(k).hexdigest()[:8], 16) % n``).

    ``key`` is a string Column; ``n`` may be an int or a Column (e.g.
    an in-plan catalog count).  Returns a long Column in ``[0, n)``.
    Centralized so a change to the idiom (width, hash) cannot drift
    between call sites and silently break cross-engine oracle parity.
    """
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return h % (n if isinstance(n, Column) else F.lit(int(n)))

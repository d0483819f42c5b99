"""Tiny shared helpers for operator argument normalization."""

from __future__ import annotations


def as_list(x) -> list:
    """Normalize a column-name argument: string -> [string], any sequence
    -> list. ``None`` raises TypeError (matching ``list(None)``) — callers
    that accept an optional argument must handle None themselves, so a
    required key like ``asof_join(on=...)`` can never silently become an
    unpartitioned global window."""
    return [x] if isinstance(x, str) else list(x)

"""Tiny shared helpers for operator argument normalization."""

from __future__ import annotations


def as_list(x) -> list:
    """Normalize a column-name argument: string -> [string], None -> [],
    any sequence -> list."""
    if x is None:
        return []
    return [x] if isinstance(x, str) else list(x)

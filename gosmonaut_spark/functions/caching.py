"""Cached-intermediate bookkeeping for operators that persist shared
subtrees (minhash signatures, tile base layers, ...).

Operators that cache internal tables attach the handles to the DataFrame
they return; callers in long-lived sessions release them with
:func:`release_cached` once the result is consumed. Without release, the
blocks stay cached until LRU eviction pressure — acceptable for one-shot
jobs, wasteful for a session running many operators back to back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_gosmonaut_cached"


def attach_cached(df: DataFrame, handles: list[DataFrame]) -> DataFrame:
    """Record persisted intermediates on the returned DataFrame."""
    setattr(df, _ATTR, list(handles))
    return df


def release_cached(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist every intermediate the producing operator cached for this
    result (no-op for DataFrames without attached handles)."""
    for h in getattr(df, _ATTR, None) or []:
        h.unpersist(blocking)
    setattr(df, _ATTR, [])

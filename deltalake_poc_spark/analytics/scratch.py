"""Bounded scratch-cache registry for diamond-reuse query plans.

Some queries (TPC-H q11/q15 shapes) need one slim aggregate read by
two branches of the SAME plan (the per-group values and their grand
total / max). Catalyst plans no ReusedExchange once column pruning
diverges the subtrees, so without a cache the fact table is scanned
twice; but a bare ``.persist()`` inside a query BUILDER leaks — the
caller never unpersists, and repeated invocations in a long-lived
session accumulate CacheManager entries. Worse than memory: Spark's
CacheManager substitutes cached subtrees into ANY later query whose
plan contains an identical subtree (see pipeline/dedup.py, where a
lingering doc_grams cache silently rewrote another query's pinned
plan shape).

This registry bounds the leak to ONE live cache per registration key:
each new invocation releases the previous invocation's cache before
persisting its own, and ``release_scratch()`` drops everything (for
sessions that want zero residue, e.g. after a bench pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCRATCH: dict[str, DataFrame] = {}


def scratch_persist(key: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` as the single live scratch cache for ``key``,
    releasing whatever the previous invocation under this key left
    behind. The returned frame is the persisted one; it stays cached
    until the NEXT call with the same key (or release_scratch)."""
    prev = _SCRATCH.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session torn down / cache already gone
    df = df.persist()
    _SCRATCH[key] = df
    return df


def release_scratch(key: str | None = None) -> None:
    """Unpersist one key's scratch cache, or all of them."""
    keys = [key] if key is not None else list(_SCRATCH)
    for k in keys:
        prev = _SCRATCH.pop(k, None)
        if prev is not None:
            try:
                prev.unpersist()
            except Exception:
                pass

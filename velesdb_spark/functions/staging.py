"""Shared registry for intra-query persisted intermediates.

Several operators persist a small derived frame because two branches of
the same query consume it (shingle arrays feeding both sides of a
similarity self-join; the BM25 tf projection feeding both the
corpus-stats aggregate and the scoring pass). Without the persist, Spark
executes the expensive upstream scan once per consuming branch.

The handles are module-global so a sweep harness (tools/check_entry.py)
can free executor memory between queries with one release_staged() call;
within a live session, leaving them cached is the desired behavior — the
reference amortizes its index builds the same way.

The registry is bounded (MAX_STAGED, default 32): a long-lived session
issuing many *distinct* scan-path queries evicts (unpersists) the oldest
handle instead of accumulating one MEMORY_AND_DISK cache entry per query
string forever. FIFO order is the right LRU proxy here because a handle
is staged exactly when its query runs; re-running the same query
re-stages a fresh frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAX_STAGED = 32

_HANDLES: list[DataFrame] = []


def _canon(df: DataFrame) -> str:
    """Canonicalized analyzed-plan string — Spark's CacheManager keys
    cache entries on this, so two DataFrames with equal canonical plans
    share ONE cache entry (unpersisting either uncaches both)."""
    try:
        return df._jdf.queryExecution().analyzed().canonicalized().toString()
    except Exception:  # pragma: no cover - py4j edge; fall back to identity
        return f"id:{id(df)}"


def stage(df: DataFrame) -> DataFrame:
    """Persist df (MEMORY_AND_DISK) and register it for release.

    Evicts the oldest staged frame once the registry exceeds MAX_STAGED
    entries, so unbounded distinct-query workloads cannot grow executor
    cache without bound. Eviction skips unpersist() when a newer
    registered handle aliases the same canonicalized plan: Spark's
    CacheManager keys on the canonical plan, so unpersisting the old
    alias would silently uncache the newer frame too.
    """
    df.persist()
    _HANDLES.append(df)
    while len(_HANDLES) > MAX_STAGED:
        evicted = _HANDLES.pop(0)
        key = _canon(evicted)
        if any(_canon(h) == key for h in _HANDLES):
            continue
        evicted.unpersist()
    return df


def staged_count() -> int:
    """Number of currently-registered staged frames (for tests/metrics)."""
    return len(_HANDLES)


def release_staged() -> None:
    """Unpersist every registered handle (harness hygiene between
    queries; never called on the hot path)."""
    while _HANDLES:
        _HANDLES.pop().unpersist()

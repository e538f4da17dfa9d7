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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_HANDLES: list[DataFrame] = []


def stage(df: DataFrame) -> DataFrame:
    """Persist df (MEMORY_AND_DISK) and register it for release."""
    df.persist()
    _HANDLES.append(df)
    return df


def release_staged() -> None:
    """Unpersist every registered handle (harness hygiene between
    queries; never called on the hot path)."""
    while _HANDLES:
        _HANDLES.pop().unpersist()

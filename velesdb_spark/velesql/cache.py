"""Parsed-query LRU cache with observable statistics.

Reference: crates/velesdb-core/src/velesql/cache.rs — an LRU over parsed
ASTs keyed by the query string, with CacheStats {hits, misses, evictions}
and hit_rate(). The module-level ``parse`` already memoizes via
functools.lru_cache; this class is the *observable* variant for
applications that monitor cache behaviour (the reference reports >90%
hit rates on repetitive workloads and exposes the counters for that).

Driver-side only — entries are ASTs, never DataFrames or results, so the
cache is bounded by ``capacity`` ASTs regardless of data scale.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from dataclasses import dataclass

from velesdb_spark.velesql.parser import parse as _parse


@dataclass
class CacheStats:
    """cache.rs CacheStats (hits/misses/evictions + hit_rate %)."""

    hits: int = 0
    misses: int = 0
    evictions: int = 0

    def hit_rate(self) -> float:
        """Hit rate as a percentage 0.0–100.0 (cache.rs:27-38)."""
        total = self.hits + self.misses
        return (self.hits / total) * 100.0 if total else 0.0


class QueryCache:
    """Thread-safe LRU of parsed VelesQL ASTs (cache.rs QueryCache).

    ``parse()`` returns the cached AST on a hit (ASTs are frozen
    dataclasses — safe to share); a miss parses, inserts, and evicts the
    least-recently-used entry past ``capacity``. Parse errors propagate
    and are never cached (each failing call re-parses, like the
    reference, whose Err results aren't stored)."""

    def __init__(self, capacity: int = 1000):
        # cache.rs clamps to a minimum of 1 (cache_tests.rs:131-142
        # test_cache_min_size: new(0) keeps exactly one entry)
        self.capacity = max(int(capacity), 1)
        self._entries: OrderedDict[str, object] = OrderedDict()
        self._lock = threading.Lock()
        self._stats = CacheStats()

    def parse(self, sql: str):
        with self._lock:
            hit = self._entries.get(sql)
            if hit is not None:
                self._entries.move_to_end(sql)
                self._stats.hits += 1
                return hit
            self._stats.misses += 1
        ast = _parse(sql)  # outside the lock: parsing is pure
        with self._lock:
            if sql not in self._entries:
                self._entries[sql] = ast
                if len(self._entries) > self.capacity:
                    self._entries.popitem(last=False)
                    self._stats.evictions += 1
            else:
                self._entries.move_to_end(sql)
        return ast

    def stats(self) -> CacheStats:
        with self._lock:
            return CacheStats(self._stats.hits, self._stats.misses,
                              self._stats.evictions)

    def len(self) -> int:
        with self._lock:
            return len(self._entries)

    def is_empty(self) -> bool:
        return self.len() == 0

    def clear(self) -> None:
        """Drop entries AND reset counters (cache.rs clear)."""
        with self._lock:
            self._entries.clear()
            self._stats = CacheStats()

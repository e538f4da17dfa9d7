"""Bloom filter for existence checks (fast negative lookups).

Reference: crates/velesdb-core/src/cache/bloom.rs — optimal sizing
m = -n·ln(p)/ln(2)², k = (m/n)·ln(2), seeded per-hash bit positions,
insert / contains / definitely_not_contains / count / clear /
estimated_fpr.

Two layers, both Spark-first:
- ``BloomFilter``: the driver-side structure (numpy bitset). Hashing is
  sha1(seed, value) — deterministic across Python and the Arrow-batched
  distributed build, so a filter built by a cluster answers the same
  membership queries as one built row-by-row.
- ``build_bloom_df``: distributed build — a pandas UDF computes each
  row's k bit positions, explode+distinct collapses them (bounded by m,
  not by row count), and the driver ORs them into the bitset. At 100 TB
  pair this with parquet's native row-group bloom filters
  (``parquet.bloom.filter.enabled#col``) which storage.LogStore enables
  on the id column — the engine-level filter serves point lookups
  without touching files at all; the parquet ones prune row groups when
  a scan is unavoidable.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(value: str, num_bits: int, num_hashes: int) -> list[int]:
    """k seeded bit positions for a value (bloom.rs hash_with_seed shape:
    one independent hash per seed i, reduced mod m)."""
    out = []
    for i in range(num_hashes):
        h = hashlib.sha1(f"{i}:{value}".encode()).digest()
        out.append(int.from_bytes(h[:8], "big") % num_bits)
    return out


class BloomFilter:
    """bloom.rs:15-140 semantics over a numpy bitset."""

    def __init__(self, capacity: int, false_positive_rate: float = 0.01):
        self.num_bits = self.optimal_bits(capacity, false_positive_rate)
        self.num_hashes = self.optimal_hashes(self.num_bits, capacity)
        self._words = np.zeros((self.num_bits + 63) // 64, dtype=np.uint64)
        self._count = 0

    @classmethod
    def with_params(cls, num_bits: int, num_hashes: int) -> "BloomFilter":
        bf = cls.__new__(cls)
        bf.num_bits = num_bits
        bf.num_hashes = num_hashes
        bf._words = np.zeros((num_bits + 63) // 64, dtype=np.uint64)
        bf._count = 0
        return bf

    @staticmethod
    def optimal_bits(capacity: int, p: float) -> int:
        return max(64, int(math.ceil(
            -capacity * math.log(p) / (math.log(2) ** 2))))

    @staticmethod
    def optimal_hashes(num_bits: int, capacity: int) -> int:
        return max(1, round(num_bits / max(capacity, 1) * math.log(2)))

    def _set(self, bit: int) -> None:
        self._words[bit // 64] |= np.uint64(1 << (bit % 64))

    def _test(self, bit: int) -> bool:
        return bool(self._words[bit // 64]
                    & np.uint64(1 << (bit % 64)))

    def insert(self, item) -> None:
        for b in _positions(str(item), self.num_bits, self.num_hashes):
            self._set(b)
        self._count += 1

    def contains(self, item) -> bool:
        return all(self._test(b) for b in
                   _positions(str(item), self.num_bits, self.num_hashes))

    def definitely_not_contains(self, item) -> bool:
        return not self.contains(item)

    def count(self) -> int:
        return self._count

    def clear(self) -> None:
        self._words[:] = 0
        self._count = 0

    def estimated_fpr(self) -> float:
        """(1 - e^(-k·n/m))^k (bloom.rs:123-140)."""
        if self._count == 0:
            return 0.0
        k, n, m = self.num_hashes, self._count, self.num_bits
        return (1.0 - math.exp(-k * n / m)) ** k


def bloom_positions(col: Column, num_bits: int, num_hashes: int) -> Column:
    """ARRAY<LONG> of a value's k bit positions — Arrow-batched, same sha1
    derivation as the driver-side filter."""
    import pandas as pd

    def _pos(v):
        return v.map(lambda x: _positions(str(x), num_bits, num_hashes))

    # explicit signature: `from __future__ import annotations` stringifies
    # hints, so pandas_udf can't infer the eval type from them
    _pos.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return F.pandas_udf(_pos, "array<long>")(col)


def build_bloom_df(df: DataFrame, col: str, capacity: int | None = None,
                   false_positive_rate: float = 0.01) -> BloomFilter:
    """Distributed bloom build over a column: positions computed in
    parallel, collapsed by explode+distinct (result bounded by num_bits),
    OR-ed into the bitset on the driver. ``capacity`` defaults to the
    column's count (one extra cheap agg)."""
    if capacity is None:
        capacity = df.select(F.count(col)).first()[0]
    bf = BloomFilter(max(int(capacity), 1), false_positive_rate)
    # NULLs are not members: without the filter they would hash as the
    # string 'None' and insert spurious bits while _count (non-null count)
    # excludes them — silently inflating the real FPR vs estimated_fpr()
    rows = (df.where(F.col(col).isNotNull())
            .select(bloom_positions(F.col(col), bf.num_bits,
                                    bf.num_hashes).alias("_p"))
            .select(F.explode("_p").alias("_b")).distinct().collect())
    for r in rows:
        bf._set(int(r._b))
    bf._count = int(capacity)
    return bf

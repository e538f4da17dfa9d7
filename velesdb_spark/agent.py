"""Agent memory: semantic / episodic / procedural layers over collections.

Reference: crates/velesdb-core/src/agent/mod.rs:1-66 (memory layers),
agent/ttl.rs (per-row TTL + eviction), agent/temporal_index.rs (time-range
recall for episodic memory). The reference builds these as structs over a
Collection; here each layer IS a Collection whose rows carry ``_ts`` (epoch
seconds, insert time) and optional ``_expires_at`` — TTL becomes a filter,
eviction a delete, the temporal index a partition/sort by ``_ts`` (at scale:
write the episodic table partitioned by date(_ts) so time-range recall
prunes partitions).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velesdb_spark.database import Collection

LAYERS = ("semantic", "episodic", "procedural")


class AgentMemory:
    """Three memory layers with TTL, temporal recall, and snapshots."""

    def __init__(self, spark: SparkSession, dimension: Optional[int] = None,
                 metric: str = "cosine", path: Optional[str] = None):
        self.spark = spark
        self.path = path
        self.layers: dict[str, Collection] = {
            name: Collection(spark, f"memory_{name}", dimension, metric,
                             path=(f"{path}/{name}" if path else None))
            for name in LAYERS
        }

    def _layer(self, layer: str) -> Collection:
        if layer not in self.layers:
            raise ValueError(f"unknown memory layer: {layer!r} (expected one of {LAYERS})")
        return self.layers[layer]

    # ------------------------------------------------------------ write
    def remember(self, layer: str, records: Sequence[dict],
                 ttl_seconds: Optional[float] = None,
                 now: Optional[float] = None) -> "AgentMemory":
        """Upsert records (dicts with at least ``id``; optional ``vector``),
        stamping ``_ts`` and ``_expires_at`` (ttl.rs row expiry)."""
        now = time.time() if now is None else float(now)
        # inf = never expires (keeps the column a plain non-null double)
        expires = (now + ttl_seconds) if ttl_seconds is not None else float("inf")
        stamped = [{**r, "_ts": float(r.get("_ts", now)), "_expires_at": expires}
                   for r in records]
        self._layer(layer).upsert(stamped)
        return self

    # ------------------------------------------------------------ read
    def _alive(self, layer: str, now: Optional[float] = None) -> DataFrame:
        now = time.time() if now is None else float(now)
        df = self._layer(layer).df
        return df.filter(F.col("_expires_at").isNull()
                         | (F.col("_expires_at") > F.lit(now)))

    def recall(self, layer: str, vector: Sequence[float], k: int = 10,
               now: Optional[float] = None) -> DataFrame:
        """Vector recall over non-expired rows (exact k-NN)."""
        from velesdb_spark.operators import topk

        coll = self._layer(layer)
        return topk.knn(self._alive(layer, now), vector, k, coll.metric,
                        coll.vector_col, coll.id_col)

    def recall_temporal(self, layer: str, since: float, until: float,
                        now: Optional[float] = None) -> DataFrame:
        """Episodic time-range recall (temporal_index.rs) — ``_ts`` range
        filter; partition pruning does the indexing at scale."""
        return (self._alive(layer, now)
                .filter((F.col("_ts") >= float(since)) & (F.col("_ts") < float(until)))
                .orderBy("_ts"))

    # ------------------------------------------------------------ maintain
    def forget_expired(self, now: Optional[float] = None) -> "AgentMemory":
        """Evict expired rows from every layer (ttl.rs eviction sweep)."""
        now = time.time() if now is None else float(now)
        for name, coll in self.layers.items():
            if coll._df is not None:
                coll._df = coll._df.filter(
                    F.col("_expires_at").isNull() | (F.col("_expires_at") > F.lit(now)))
        return self

    def snapshot(self, path: Optional[str] = None) -> str:
        """Write every layer to parquet (agent snapshots)."""
        base = path or self.path
        if not base:
            raise ValueError("snapshot needs a path")
        for name, coll in self.layers.items():
            if coll._df is not None:
                coll.df.write.mode("overwrite").parquet(f"{base}/{name}")
        return base

    @classmethod
    def restore(cls, spark: SparkSession, path: str,
                dimension: Optional[int] = None, metric: str = "cosine") -> "AgentMemory":
        from pyspark.errors import AnalysisException

        mem = cls(spark, dimension, metric, path=path)
        for name in LAYERS:
            try:
                mem.layers[name]._df = spark.read.parquet(f"{path}/{name}")
            except AnalysisException as exc:
                # only a missing layer directory means "never snapshotted";
                # corrupt files / IO errors must surface
                if "PATH_NOT_FOUND" not in str(exc):
                    raise
        return mem

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
        """Vector recall over non-expired rows (exact k-NN). The query
        vector is dim-validated eagerly (agent/memory_tests.rs
        test_semantic_dimension_mismatch) — zip_with on a mismatched
        query would otherwise score every row NULL silently."""
        from velesdb_spark.operators import topk

        coll = self._layer(layer)
        if coll.dimension is not None and len(vector) != coll.dimension:
            raise ValueError(
                f"query vector has {len(vector)} dimensions, memory layer "
                f"{layer!r} expects {coll.dimension}")
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

    # ------------------------------------------- bindings layer views
    @property
    def episodic(self) -> "EpisodicView":
        """memory.episodic.record/recent/recall_similar (bindings
        agent.rs PyEpisodicMemory)."""
        return EpisodicView(self)

    @property
    def semantic(self) -> "SemanticView":
        """memory.semantic.store/query (bindings agent.rs
        PySemanticMemory)."""
        return SemanticView(self)

    @property
    def procedural(self) -> "ProceduralMemory":
        """memory.procedural.learn/recall/reinforce (bindings agent.rs
        PyProceduralMemory) — one instance per AgentMemory."""
        pm = getattr(self, "_procedural", None)
        if pm is None:
            pm = self._procedural = ProceduralMemory(self)
        return pm


class EpisodicView:
    """Bindings-shaped episodic API over the episodic layer
    (velesdb-python agent.rs:184-270)."""

    def __init__(self, memory: AgentMemory):
        self.memory = memory

    def record(self, event_id: int, description: str, timestamp: int,
               embedding: Optional[Sequence[float]] = None) -> None:
        row: dict = {"id": int(event_id), "description": description,
                     "_ts": float(timestamp)}
        if embedding is not None:
            row["vector"] = [float(x) for x in embedding]
        self.memory.remember("episodic", [row])

    def recent(self, limit: int = 10,
               since: Optional[int] = None) -> list[dict]:
        """Newest-first (temporal_index.rs:122-140 iterates the ts map in
        reverse); ``since`` is exclusive (ts <= since skipped)."""
        layer = self.memory.layers["episodic"]
        if layer._df is None:
            return []
        df = self.memory._alive("episodic")
        if since is not None:
            df = df.filter(F.col("_ts") > float(since))
        rows = (df.orderBy(F.desc("_ts"), F.desc(layer.id_col))
                .limit(int(limit)).collect())
        return [{"id": int(r[layer.id_col]), "description": r["description"],
                 "timestamp": int(r["_ts"])} for r in rows]

    def recall_similar(self, embedding: Sequence[float],
                       top_k: int = 10) -> list[dict]:
        layer = self.memory.layers["episodic"]
        if layer._df is None:
            return []
        rows = self.memory.recall("episodic", embedding, top_k).collect()
        return [{"id": int(r[layer.id_col]), "description": r["description"],
                 "timestamp": int(r["_ts"]), "score": float(r["score"])}
                for r in rows]


class SemanticView:
    """Bindings-shaped semantic API (velesdb-python agent.rs:120-181)."""

    def __init__(self, memory: AgentMemory):
        self.memory = memory

    def store(self, id: int, content: str,
              embedding: Sequence[float]) -> None:
        self.memory.remember("semantic", [{
            "id": int(id), "content": content,
            "vector": [float(x) for x in embedding]}])

    def query(self, embedding: Sequence[float],
              top_k: int = 10) -> list[dict]:
        layer = self.memory.layers["semantic"]
        if layer._df is None:
            return []
        rows = self.memory.recall("semantic", embedding, top_k).collect()
        return [{"id": int(r[layer.id_col]), "score": float(r["score"]),
                 "content": r["content"]} for r in rows]


# ---------------------------------------------------------------- reinforcement

class ReinforcementContext:
    """agent/reinforcement.rs:14-90 — usage/recency/success context for a
    confidence update. Timestamps are epoch seconds; ``now`` is injectable
    for determinism."""

    def __init__(self, usage_count: int = 0, last_used: float = 0.0,
                 created_at: float = 0.0,
                 recent_success_rate: Optional[float] = None,
                 custom: Optional[dict] = None,
                 now: Optional[float] = None):
        self.usage_count = usage_count
        self.last_used = last_used
        self.created_at = created_at
        self.recent_success_rate = recent_success_rate
        self.custom = dict(custom or {})
        self._now = time.time() if now is None else float(now)

    def age_seconds(self) -> float:
        return max(self._now - self.created_at, 0.0)

    def time_since_last_use(self) -> float:
        return max(self._now - self.last_used, 0.0)


def _clamp01(x: float) -> float:
    return min(max(x, 0.0), 1.0)


class FixedRate:
    """+success_delta on success, −failure_delta on failure, clamped
    (reinforcement.rs:121-165; defaults 0.1 / 0.05)."""

    name = "FixedRate"

    def __init__(self, success_delta: float = 0.1, failure_delta: float = 0.05):
        self.success_delta = success_delta
        self.failure_delta = failure_delta

    def update_confidence(self, old: float, success: bool,
                          ctx: ReinforcementContext) -> float:
        return _clamp01(old + (self.success_delta if success
                               else -self.failure_delta))


class AdaptiveLearningRate:
    """Learning rate halves every ``half_life_usage`` uses, floored at
    ``min_rate_multiplier`` (reinforcement.rs:167-225)."""

    name = "AdaptiveLearningRate"

    def __init__(self, base_success_rate: float = 0.2,
                 base_failure_rate: float = 0.1, half_life_usage: int = 10,
                 min_rate_multiplier: float = 0.1):
        self.base_success_rate = base_success_rate
        self.base_failure_rate = base_failure_rate
        self.half_life_usage = half_life_usage
        self.min_rate_multiplier = min_rate_multiplier

    def rate_multiplier(self, usage_count: int) -> float:
        half = max(self.half_life_usage, 1)
        return max(0.5 ** (usage_count / half), self.min_rate_multiplier)

    def update_confidence(self, old: float, success: bool,
                          ctx: ReinforcementContext) -> float:
        m = self.rate_multiplier(ctx.usage_count)
        delta = self.base_success_rate * m if success \
            else -self.base_failure_rate * m
        return _clamp01(old + delta)


class TemporalDecay:
    """Confidence decays toward 0 with time since last use (half-life,
    capped per update) before the fixed-rate delta applies
    (reinforcement.rs:227-292; default half-life 30 days, cap 0.1)."""

    name = "TemporalDecay"

    def __init__(self, base: Optional[FixedRate] = None,
                 decay_half_life: float = 30 * 24 * 3600,
                 max_decay_per_update: float = 0.1):
        self.base = base or FixedRate()
        self.decay_half_life = decay_half_life
        self.max_decay_per_update = max_decay_per_update

    def decay_factor(self, time_since_last_use: float) -> float:
        half = max(self.decay_half_life, 1)
        return min(1.0 - 0.5 ** (time_since_last_use / half),
                   self.max_decay_per_update)

    def update_confidence(self, old: float, success: bool,
                          ctx: ReinforcementContext) -> float:
        decayed = old * (1.0 - self.decay_factor(ctx.time_since_last_use()))
        delta = self.base.success_delta if success else -self.base.failure_delta
        return _clamp01(decayed + delta)


class ContextualReinforcement:
    """Weighted recency/usage/success-rate context scales the learning rate
    (reinforcement.rs:294-366); failures learn at half the rate."""

    name = "ContextualReinforcement"

    def __init__(self, success_rate_weight: float = 0.3,
                 usage_weight: float = 0.3, recency_weight: float = 0.4,
                 base_rate: float = 0.15):
        self.success_rate_weight = success_rate_weight
        self.usage_weight = usage_weight
        self.recency_weight = recency_weight
        self.base_rate = base_rate

    @staticmethod
    def recency_factor(time_since_last_use: float) -> float:
        import math

        return math.exp(-(time_since_last_use / 3600.0) / 168.0)

    @staticmethod
    def usage_factor(usage_count: int) -> float:
        import math

        return min(math.log1p(usage_count) / 10.0, 1.0)

    def update_confidence(self, old: float, success: bool,
                          ctx: ReinforcementContext) -> float:
        score = (self.recency_weight
                 * self.recency_factor(ctx.time_since_last_use())
                 + self.usage_weight * self.usage_factor(ctx.usage_count)
                 + self.success_rate_weight
                 * (0.5 if ctx.recent_success_rate is None
                    else ctx.recent_success_rate))
        rate = self.base_rate * (0.5 + score)
        return _clamp01(old + (rate if success else -rate * 0.5))


class CompositeStrategy:
    """Weight-normalized blend of strategies (reinforcement.rs:369-430)."""

    name = "Composite"

    def __init__(self):
        self.strategies: list[tuple[object, float]] = []

    def add_strategy(self, strategy, weight: float) -> "CompositeStrategy":
        self.strategies.append((strategy, weight))
        return self

    def update_confidence(self, old: float, success: bool,
                          ctx: ReinforcementContext) -> float:
        total = sum(w for _, w in self.strategies)
        if total <= 0:
            return old
        blended = sum(s.update_confidence(old, success, ctx) * w
                      for s, w in self.strategies) / total
        return _clamp01(blended)


class ProceduralMemory:
    """Procedures = (name, steps, confidence) rows in the procedural layer
    (agent/procedural_memory.rs): ``learn`` upserts, ``recall`` is vector
    top-k filtered by min_confidence, ``reinforce`` rewrites confidence via
    a strategy and bumps usage stats. Batch-scale reinforcement
    (``reinforce_batch``) applies one strategy to MANY procedure outcomes
    in a single upsert — the fleet-feedback shape."""

    def __init__(self, memory: AgentMemory, strategy=None):
        self.memory = memory
        self.strategy = strategy or FixedRate()

    def learn(self, proc_id: int, name: str, steps: Sequence[str],
              vector: Sequence[float], confidence: float = 0.5,
              ttl_seconds: Optional[float] = None,
              now: Optional[float] = None) -> "ProceduralMemory":
        now = time.time() if now is None else float(now)
        self.memory.remember("procedural", [{
            "id": int(proc_id), "name": name, "steps": list(steps),
            "vector": [float(x) for x in vector],
            "confidence": float(confidence), "usage_count": 0,
            "last_used": now, "created_at": now,
        }], ttl_seconds=ttl_seconds, now=now)
        return self

    def recall(self, vector: Sequence[float], k: int = 10,
               min_confidence: float = 0.0,
               now: Optional[float] = None) -> DataFrame:
        return (self.memory.recall("procedural", vector, k, now=now)
                .filter(F.col("confidence") >= float(min_confidence)))

    def reinforce(self, proc_id: int, success: bool, strategy=None,
                  now: Optional[float] = None) -> float:
        """Single-procedure feedback; returns the new confidence."""
        row = self.memory.layers["procedural"].get(int(proc_id))
        if row is None:
            raise KeyError(f"procedure {proc_id} not found")
        now = time.time() if now is None else float(now)
        strategy = strategy or self.strategy
        ctx = ReinforcementContext(
            usage_count=int(row.get("usage_count", 0)),
            last_used=float(row.get("last_used", 0.0)),
            created_at=float(row.get("created_at", 0.0)), now=now)
        new_conf = strategy.update_confidence(
            float(row.get("confidence", 0.5)), success, ctx)
        updated = {**{k: v for k, v in row.items()},
                   "confidence": float(new_conf),
                   "usage_count": ctx.usage_count + 1, "last_used": now}
        self.memory.layers["procedural"].upsert([updated])
        return new_conf

    def reinforce_batch(self, outcomes: dict[int, bool], strategy=None,
                        now: Optional[float] = None) -> dict[int, float]:
        """Apply feedback for many procedures in ONE batch: a single
        isin-filtered fetch of the touched rows, confidences computed
        driver-side, then a single upsert — one log segment / one
        lineage step for the whole fleet's feedback, not one Spark
        round-trip per procedure."""
        if not outcomes:
            return {}
        now = time.time() if now is None else float(now)
        strategy = strategy or self.strategy
        layer = self.memory.layers["procedural"]
        ids = [int(p) for p in outcomes]
        fetched = {int(r[layer.id_col]): r.asDict(recursive=True)
                   for r in layer.df.filter(
                       F.col(layer.id_col).isin(ids)).collect()}
        missing = [p for p in ids if p not in fetched]
        if missing:
            raise KeyError(f"procedure {missing[0]} not found")
        updates, confs = [], {}
        for pid, ok in outcomes.items():
            row = fetched[int(pid)]
            ctx = ReinforcementContext(
                usage_count=int(row.get("usage_count", 0)),
                last_used=float(row.get("last_used", 0.0)),
                created_at=float(row.get("created_at", 0.0)), now=now)
            new_conf = strategy.update_confidence(
                float(row.get("confidence", 0.5)), ok, ctx)
            updates.append({**row, "confidence": float(new_conf),
                            "usage_count": ctx.usage_count + 1,
                            "last_used": now})
            confs[pid] = new_conf
        layer.upsert(updates)
        return confs

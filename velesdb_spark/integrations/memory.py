"""LangChain memory classes over the agent-memory layers.

Reference: integrations/langchain/src/langchain_velesdb/memory.py —
VelesDBChatMemory (conversation history on EpisodicMemory) and
VelesDBSemanticMemory (fact store for RAG on SemanticMemory), mapped to
``velesdb_spark.agent.AgentMemory``'s episodic / semantic layers: record
= remember() with a ``_ts`` stamp, recent = latest-N over the alive
episodic rows, fact query = exact vector recall.

``langchain`` is optional: HumanMessage/AIMessage stand-ins carry the
same ``content`` attribute when it is not installed.
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Any, Dict, List, Optional

try:  # memory.py:22-28
    from langchain_core.messages import AIMessage, HumanMessage  # type: ignore
except ImportError:
    class _Msg:
        def __init__(self, content: str = ""):
            self.content = content

        def __eq__(self, other):
            return type(self) is type(other) and self.content == other.content

    class HumanMessage(_Msg):  # type: ignore[no-redef]
        pass

    class AIMessage(_Msg):  # type: ignore[no-redef]
        pass


class VelesDBChatMemory:
    """Chat history on the episodic layer (memory.py:40-178).

    save_context records the human and AI turns as two episodic events
    (JSON role/content descriptions, AI stamped 1s after the human turn);
    load_memory_variables returns the most recent 20 events in
    chronological order, as a formatted string or message objects."""

    RECENT_LIMIT = 20

    def __init__(self, spark=None, path: Optional[str] = None,
                 dimension: int = 384, memory_key: str = "history",
                 human_prefix: str = "Human", ai_prefix: str = "AI",
                 return_messages: bool = False):
        from velesdb_spark.agent import AgentMemory
        from velesdb_spark.session import get_spark

        self.path = path
        self.dimension = dimension
        self.memory_key = memory_key
        self.human_prefix = human_prefix
        self.ai_prefix = ai_prefix
        self.return_messages = return_messages
        spark = spark or get_spark("velesdb-chat-memory")
        self._memory = AgentMemory(spark, dimension=dimension, path=path)
        # timestamp+uuid base avoids collisions between concurrent
        # instances (memory.py:82-83)
        self._message_counter = (int(time.time() * 1000)
                                 + (uuid.uuid4().int % 1_000_000))

    @property
    def memory_variables(self) -> List[str]:
        return [self.memory_key]

    def _recent_events(self) -> List[tuple]:
        """Latest RECENT_LIMIT (event_id, description, timestamp),
        chronological — one TakeOrdered job over the alive episodic rows.
        Recency keys on the monotonic event id, not the stored timestamp:
        ``record`` stamps whole seconds, so two turns in the same second
        would interleave under a timestamp sort."""
        layer = self._memory.layers["episodic"]
        if layer._df is None:
            return []
        from pyspark.sql import functions as F

        rows = (self._memory._alive("episodic")
                .orderBy(F.desc(layer.id_col))
                .limit(self.RECENT_LIMIT).collect())
        return [(int(r[layer.id_col]), r["description"], float(r["_ts"]))
                for r in reversed(rows)]

    def load_memory_variables(self, inputs: Dict[str, Any]) -> Dict[str, Any]:
        events = self._recent_events()
        if self.return_messages:
            return {self.memory_key: self._events_to_messages(events)}
        return {self.memory_key: self._events_to_string(events)}

    def save_context(self, inputs: Dict[str, Any],
                     outputs: Dict[str, str]) -> None:
        input_str = inputs.get("input", inputs.get("human_input", ""))
        output_str = outputs.get("output", outputs.get("response", ""))
        ts = int(time.time())
        self._message_counter += 1
        self._memory.remember("episodic", [{
            "id": self._message_counter,
            "description": json.dumps({"role": "human",
                                       "content": input_str}),
            "_ts": float(ts)}])
        self._message_counter += 1
        self._memory.remember("episodic", [{
            "id": self._message_counter,
            "description": json.dumps({"role": "ai", "content": output_str}),
            "_ts": float(ts + 1)}])  # slightly after the human turn

    def clear(self) -> None:
        """Start a new session id-range (memory.py:136-144 resets the
        counter only; recorded events persist in the store)."""
        self._message_counter = (int(time.time() * 1000)
                                 + (uuid.uuid4().int % 1_000_000))

    def _events_to_messages(self, events: List[tuple]):
        messages = []
        for _eid, description, _ts in events:
            try:
                data = json.loads(description)
                content = data.get("content", description)
                if data.get("role", "human") == "human":
                    messages.append(HumanMessage(content=content))
                else:
                    messages.append(AIMessage(content=content))
            except (json.JSONDecodeError, TypeError):
                messages.append(HumanMessage(content=description))
        return messages

    def _events_to_string(self, events: List[tuple]) -> str:
        lines = []
        for _eid, description, _ts in events:
            try:
                data = json.loads(description)
                prefix = (self.human_prefix
                          if data.get("role", "human") == "human"
                          else self.ai_prefix)
                lines.append(f"{prefix}: {data.get('content', description)}")
            except (json.JSONDecodeError, TypeError):
                lines.append(f"{self.human_prefix}: {description}")
        return "\n".join(lines)


class VelesDBSemanticMemory:
    """Fact store for RAG on the semantic layer (memory.py:181-271)."""

    def __init__(self, embedding: Any, spark=None,
                 path: Optional[str] = None, dimension: Optional[int] = None):
        from velesdb_spark.agent import AgentMemory
        from velesdb_spark.session import get_spark

        self.path = path
        self.embedding = embedding
        if dimension is None:
            dimension = len(embedding.embed_query("test"))
        self.dimension = dimension
        spark = spark or get_spark("velesdb-semantic-memory")
        self._memory = AgentMemory(spark, dimension=dimension, path=path)
        self._fact_counter = int(time.time() * 1000)

    def add_fact(self, fact: str, fact_id: Optional[int] = None) -> int:
        if fact_id is None:
            self._fact_counter += 1
            fact_id = self._fact_counter
        self._memory.semantic.store(int(fact_id), fact,
                                    self.embedding.embed_query(fact))
        return fact_id

    def add_facts(self, facts: List[str]) -> List[int]:
        """One upsert for the whole batch (the engine batches natively,
        unlike the reference's per-fact store loop)."""
        if not facts:
            return []
        vecs = [self.embedding.embed_query(f) for f in facts]
        ids = []
        records = []
        for fact, vec in zip(facts, vecs):
            self._fact_counter += 1
            ids.append(self._fact_counter)
            records.append({"id": self._fact_counter, "content": fact,
                            "vector": [float(x) for x in vec]})
        self._memory.remember("semantic", records)
        return ids

    def query(self, query: str, k: int = 5) -> List[Dict[str, Any]]:
        """Top-k similar facts → [{'id', 'score', 'content'}] (the
        bindings' semantic.query shape)."""
        return self._memory.semantic.query(
            self.embedding.embed_query(query), top_k=k)

    def clear(self) -> None:
        """Reset the fact counter (facts persist, memory.py:269-271)."""
        self._fact_counter = int(time.time() * 1000)

"""Graph-expanded retrievers for RAG (seed + expand).

Reference: integrations/langchain/src/langchain_velesdb/graph_retriever.py
(and the llamaindex twin) — GraphRetriever runs a vector search for seed
documents, expands context along the collection's edges, and returns the
combined set with graph_depth / relevance_score / retrieval_mode stamps;
GraphQARetriever adds content-hash dedup and (depth, -score) re-ranking.

One structural difference: the reference traverses via the REST server's
``/graph/traverse`` endpoint; here traversal is the engine's own
distributed BFS (Collection.traverse_bfs), so ``server_url`` /
``timeout_ms`` / ``fallback_on_timeout`` are accepted for signature
compatibility but no network call exists to time out. ``low_latency``
keeps its meaning: skip expansion entirely.
"""

from __future__ import annotations

import hashlib
from typing import Any, List, Optional, Sequence

from velesdb_spark.integrations.security import validate_k


class TraversalResult:
    """graph_retriever.py:46-51 TraversalResult."""

    def __init__(self, target_id: int, depth: int,
                 path: Optional[List[int]] = None):
        self.target_id = target_id
        self.depth = depth
        self.path = path or []


class GraphRetriever:
    """Seed-and-expand retriever (graph_retriever.py:54-260)."""

    def __init__(self, vector_store: Any, server_url: Optional[str] = None,
                 seed_k: int = 3, expand_k: int = 10, max_depth: int = 2,
                 rel_types: Optional[Sequence[str]] = None,
                 score_threshold: float = 0.0, low_latency: bool = False,
                 timeout_ms: int = 1000, fallback_on_timeout: bool = True,
                 **kwargs: Any):
        if server_url is not None:
            from velesdb_spark.integrations.security import validate_url

            validate_url(server_url)
        validate_k(seed_k, "seed_k")
        validate_k(expand_k, "expand_k")
        self.vector_store = vector_store
        self.server_url = server_url
        self.seed_k = seed_k
        self.expand_k = expand_k
        self.max_depth = max_depth
        self.rel_types = list(rel_types) if rel_types else None
        self.score_threshold = score_threshold
        self.low_latency = low_latency
        self.timeout_ms = timeout_ms
        self.fallback_on_timeout = fallback_on_timeout

    # LangChain retriever protocol
    def invoke(self, query: str) -> list:
        return self._get_relevant_documents(query)

    def get_relevant_documents(self, query: str) -> list:
        return self._get_relevant_documents(query)

    def _get_relevant_documents(self, query: str, *, run_manager=None) -> list:
        """graph_retriever.py:119-213: vector seeds → per-seed BFS →
        hydrate neighbors, stamped and capped at expand_k."""
        seed_results = self.vector_store.similarity_search_with_score(
            query, k=self.seed_k if self.low_latency else self.expand_k)
        seeds = [(d, s) for d, s in seed_results if s >= self.score_threshold]
        if not seeds:
            return []

        if self.low_latency:  # vector-only fast path (:148-156)
            out = []
            for doc, score in seeds[:self.expand_k]:
                doc.metadata["graph_depth"] = 0
                doc.metadata["relevance_score"] = score
                doc.metadata["retrieval_mode"] = "vector_only"
                out.append(doc)
            return out

        expanded_ids: set = set()
        seed_docs: dict = {}
        graph_available = True
        for doc, score in seeds:
            doc_id = doc.metadata.get("id") or doc.metadata.get("doc_id")
            if doc_id is None:
                continue
            seed_docs[doc_id] = (doc, score)
            expanded_ids.add(doc_id)
            if graph_available:
                try:
                    expanded_ids.update(self._traverse_graph(int(doc_id)))
                except Exception:
                    # traversal is optional context — degrade to
                    # vector-only like the reference's timeout fallback
                    if self.fallback_on_timeout:
                        graph_available = False
                    else:
                        raise

        result_docs = []
        for _doc_id, (doc, score) in seed_docs.items():
            doc.metadata["graph_depth"] = 0
            doc.metadata["relevance_score"] = score
            doc.metadata["retrieval_mode"] = (
                "graph_expanded" if graph_available else "vector_fallback")
            result_docs.append(doc)

        if graph_available:
            remaining = self.expand_k - len(result_docs)
            neighbor_ids = [n for n in expanded_ids
                            if n not in seed_docs][:max(remaining, 0)]
            if neighbor_ids:
                fetched = self.vector_store.get_by_ids(
                    [str(n) for n in neighbor_ids])
                for ndoc in fetched:
                    ndoc.metadata["graph_depth"] = 1
                    ndoc.metadata["retrieval_mode"] = "graph_expanded"
                    result_docs.append(ndoc)
        return result_docs[:self.expand_k]

    def _traverse_graph(self, source_id: int) -> List[int]:
        """BFS neighbor ids within max_depth — the engine's distributed
        traversal instead of the reference's REST call (:216-246); the
        2·expand_k result cap matches the reference's request limit."""
        collection = getattr(self.vector_store, "_collection", None)
        if collection is None or not collection._has_edges():
            return []
        df = collection.traverse_bfs(source_id, self.max_depth,
                                     self.rel_types or ())
        rows = df.limit(self.expand_k * 2).collect()
        return [int(r["node_id"]) for r in rows]


class GraphQARetriever(GraphRetriever):
    """Q&A variant: dedup + (graph_depth, -score) re-rank
    (graph_retriever.py:263-318)."""

    def __init__(self, *args, expansion_strategy: str = "breadth_first",
                 deduplicate: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.expansion_strategy = expansion_strategy
        self.deduplicate = deduplicate

    def _get_relevant_documents(self, query: str, *, run_manager=None) -> list:
        docs = super()._get_relevant_documents(query, run_manager=run_manager)
        if self.deduplicate:
            docs = self._deduplicate(docs)
        docs.sort(key=lambda d: (d.metadata.get("graph_depth", 999),
                                 -d.metadata.get("relevance_score", 0)))
        return docs

    @staticmethod
    def _deduplicate(docs: list) -> list:
        seen, unique = set(), []
        for doc in docs:
            h = hashlib.sha256(doc.page_content[:200].encode()).hexdigest()
            if h not in seen:
                seen.add(h)
                unique.append(doc)
        return unique

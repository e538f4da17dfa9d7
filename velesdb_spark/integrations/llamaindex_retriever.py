"""LlamaIndex graph-expanded retriever (seed + expand).

Reference: integrations/llamaindex/src/llamaindex_velesdb/
graph_retriever.py — GraphRetriever retrieves vector seeds, expands
along the collection's behavior graph, and returns NodeWithScore
results stamped with graph_depth / retrieval_mode; expanded neighbors
carry the reference's fixed 0.5 score (:213-218).

Differences forced by the runtime: seeds come from this package's
VelesDBVectorStore + an ``embed_model`` (duck-typed ``embed_query``)
rather than a VectorStoreIndex retriever, and traversal is the engine's
distributed BFS instead of the reference's REST call — ``server_url`` /
``timeout_ms`` / ``fallback_on_timeout`` stay accepted for signature
compatibility.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

from velesdb_spark.integrations.llamaindex_store import (
    TextNode,
    VectorStoreQuery,
)
from velesdb_spark.integrations.security import validate_k


class NodeWithScore:
    """Minimal llama_index NodeWithScore stand-in (node + score)."""

    def __init__(self, node: TextNode, score: float = 0.0):
        self.node = node
        self.score = score


class GraphRetriever:
    """graph_retriever.py:43-307 over the engine's vector store."""

    def __init__(self, vector_store: Any, embed_model: Any,
                 server_url: Optional[str] = None, seed_k: int = 3,
                 expand_k: int = 10, max_depth: int = 2,
                 rel_types: Optional[Sequence[str]] = None,
                 low_latency: bool = False, timeout_ms: int = 1000,
                 fallback_on_timeout: bool = True, **kwargs: Any):
        if server_url is not None:
            from velesdb_spark.integrations.security import validate_url

            validate_url(server_url)
        validate_k(seed_k, "seed_k")
        validate_k(expand_k, "expand_k")
        self._vector_store = vector_store
        self._embed_model = embed_model
        self._seed_k = seed_k
        self._expand_k = expand_k
        self._max_depth = max_depth
        self._rel_types = list(rel_types) if rel_types else []
        self._low_latency = low_latency
        self._fallback_on_timeout = fallback_on_timeout

    def retrieve(self, query: Any) -> List[NodeWithScore]:
        """Accepts a query string or a QueryBundle-like object with
        ``query_str`` (the reference's _retrieve contract)."""
        query_str = getattr(query, "query_str", query)
        emb = self._embed_model.embed_query(query_str)
        k = self._seed_k if self._low_latency else self._expand_k
        res = self._vector_store.query(VectorStoreQuery(
            query_embedding=emb, similarity_top_k=k))
        seeds = [NodeWithScore(n, s)
                 for n, s in zip(res.nodes, res.similarities)]
        if not seeds:
            return []

        if self._low_latency:  # :157-163
            for nws in seeds[: self._expand_k]:
                nws.node.metadata["graph_depth"] = 0
                nws.node.metadata["retrieval_mode"] = "vector_only"
            return seeds[: self._expand_k]

        expanded_ids: set = set()
        seed_map: dict = {}
        graph_available = True
        for nws in seeds:
            node_id = self._extract_node_id(nws.node)
            if node_id is None:
                continue
            seed_map[node_id] = nws
            expanded_ids.add(node_id)
            if graph_available:
                try:
                    expanded_ids.update(self._traverse_graph(node_id))
                except Exception:
                    if self._fallback_on_timeout:
                        graph_available = False
                    else:
                        raise

        results: List[NodeWithScore] = []
        for _nid, nws in seed_map.items():
            nws.node.metadata["graph_depth"] = 0
            nws.node.metadata["retrieval_mode"] = (
                "graph_expanded" if graph_available else "vector_fallback")
            results.append(nws)
        if graph_available:
            remaining = self._expand_k - len(results)
            neighbor_ids = [n for n in expanded_ids
                            if n not in seed_map][:max(remaining, 0)]
            for node in self._fetch_nodes(neighbor_ids):
                node.metadata["graph_depth"] = 1
                node.metadata["retrieval_mode"] = "graph_expanded"
                # expanded nodes carry the reference's fixed lower score
                results.append(NodeWithScore(node, 0.5))
        return results[: self._expand_k]

    @staticmethod
    def _extract_node_id(node: Any) -> Optional[int]:
        """graph_retriever.py:227-245 — metadata id/doc_id/node_id, then
        a numeric node_id attribute."""
        meta = getattr(node, "metadata", None) or {}
        for key in ("id", "doc_id", "node_id"):
            if key in meta:
                val = meta[key]
                try:
                    return int(val)
                except (ValueError, TypeError):
                    return None
        try:
            return int(getattr(node, "node_id", None))
        except (ValueError, TypeError):
            return None

    def _traverse_graph(self, source_id: int) -> List[int]:
        collection = getattr(self._vector_store, "_collection", None)
        if collection is None or not collection._has_edges():
            return []
        df = collection.traverse_bfs(int(source_id), self._max_depth,
                                     tuple(self._rel_types))
        return [int(r["node_id"])
                for r in df.limit(self._expand_k * 2).collect()]

    def _fetch_nodes(self, int_ids: List[int]) -> List[TextNode]:
        """Hydrate neighbor nodes by COLLECTION id in one isin scan (the
        reference fetches one-by-one via get_by_id, :280-297)."""
        collection = getattr(self._vector_store, "_collection", None)
        if collection is None or not int_ids:
            return []
        from pyspark.sql import functions as F

        reserved = {"id", "vector", "text", "node_id", "score"}
        out = []
        rows = {int(r[collection.id_col]): r.asDict(recursive=True)
                for r in collection.df.filter(
                    F.col(collection.id_col).isin(int_ids)).collect()}
        for iid in int_ids:
            row = rows.get(iid)
            if row is None:
                continue
            meta = {k: v for k, v in row.items()
                    if k not in reserved and not k.startswith("_vql")
                    and v is not None}
            out.append(TextNode(text=row.get("text") or "",
                                id_=row.get("node_id") or str(iid),
                                metadata=meta))
        return out


class GraphQARetriever(GraphRetriever):
    """Q&A variant: dedup by content hash + (depth, -score) re-rank
    (graph_retriever.py:300-329)."""

    def __init__(self, *args, deduplicate: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self._deduplicate = deduplicate

    def retrieve(self, query: Any) -> List[NodeWithScore]:
        import hashlib

        results = super().retrieve(query)
        if self._deduplicate:
            seen, unique = set(), []
            for nws in results:
                h = hashlib.sha256(
                    nws.node.get_content()[:200].encode()).hexdigest()
                if h not in seen:
                    seen.add(h)
                    unique.append(nws)
            results = unique
        results.sort(key=lambda r: (r.node.metadata.get("graph_depth", 999),
                                    -r.score))
        return results

"""Knowledge-graph loader for LlamaIndex data.

Reference: integrations/llamaindex/src/llamaindex_velesdb/graph_loader.py
— GraphLoader builds a knowledge graph on a vector store's collection:
add_node/add_edge pass through to the graph layer, get_edges returns
bindings-shaped edge dicts, load_from_nodes ingests LlamaIndex nodes as
DOCUMENT-labeled graph nodes with deterministic SHA256 ids.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, List, Optional


def _generate_id(name: str, entity_type: str) -> int:
    """Deterministic id from (type, name) — graph_loader.py:30-33."""
    h = hashlib.sha256(f"{entity_type}:{name}".encode("utf-8")).hexdigest()
    return int(h[:15], 16)


class GraphLoader:
    """graph_loader.py:36-221 over the engine's Collection graph layer."""

    def __init__(self, vector_store: Any) -> None:
        self._vector_store = vector_store

    def _get_collection(self):
        return getattr(self._vector_store, "_collection", None)

    def _require_collection(self):
        collection = self._get_collection()
        if collection is None:
            raise ValueError("Collection not initialized")
        return collection

    def add_node(self, id: int, label: str,
                 metadata: Optional[Dict[str, Any]] = None,
                 vector: Optional[List[float]] = None) -> None:
        self._require_collection().add_node(id=id, label=label,
                                            metadata=metadata,
                                            vector=vector)

    def add_edge(self, id: int, source: int, target: int, label: str,
                 metadata: Optional[Dict[str, Any]] = None) -> None:
        self._require_collection().add_edge(id=id, source=source,
                                            target=target, label=label,
                                            metadata=metadata)

    def get_edges(self, label: Optional[str] = None,
                  limit: Optional[int] = None) -> List[Dict[str, Any]]:
        collection = self._get_collection()
        if collection is None:
            return []
        return collection.get_edges(label=label, limit=limit)

    def load_from_nodes(self, nodes: List[Any],
                        node_label: str = "DOCUMENT",
                        extract_relations: bool = False) -> Dict[str, int]:
        """LlamaIndex nodes → labeled graph nodes in ONE upsert (the
        reference loops add_node per node, graph_loader.py:168-215; the
        engine batches natively — one log segment for the load)."""
        collection = self._require_collection()
        rows = []
        for node in nodes:
            content = (node.get_content()
                       if hasattr(node, "get_content") else None)
            row = {collection.id_col: _generate_id(node.node_id, node_label),
                   "labels": [node_label], "node_id": node.node_id,
                   "text_preview": content[:200] if content else ""}
            if getattr(node, "metadata", None):
                for k, v in node.metadata.items():
                    # reserved row fields (id/labels/node_id/text_preview)
                    # win over same-named metadata keys, matching the
                    # shadowing guard in both vectorstore adapters
                    if k in row:
                        continue
                    if isinstance(v, (str, int, float, bool)):
                        row[k] = v
            rows.append(row)
        if rows:
            keys: list[str] = []
            for r in rows:
                for k in r:
                    if k not in keys:
                        keys.append(k)
            collection.upsert([{k: r.get(k) for k in keys} for r in rows])
        return {"nodes": len(rows), "edges": 0}

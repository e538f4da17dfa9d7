"""LlamaIndex VectorStore adapter over the Spark-native engine.

Reference: integrations/llamaindex/src/llamaindex_velesdb/vectorstore.py —
VelesDBVectorStore for LlamaIndex (add/delete/query + hybrid, text,
batch, VelesQL, multi-query fusion), re-expressed over
``velesdb_spark.database``. Node rows are stored flattened: the engine
keeps ``text``/``node_id``/scalar-metadata as columns, the stable-hashed
node id as the integer key (vectorstore.py:38-56).

``llama_index`` is optional: real TextNode / VectorStoreQueryResult are
used when importable; otherwise duck-typed stand-ins with the same
attributes keep the adapter testable without the package. Input nodes
only need ``node_id``, ``get_embedding()``, ``get_content()``, and
``metadata`` — the BaseNode protocol surface the reference touches.
"""

from __future__ import annotations

import hashlib
from typing import Any, List, Optional

from velesdb_spark.integrations.security import (
    validate_batch_size,
    validate_k,
    validate_text,
    validate_weight,
)

try:  # real LlamaIndex types when available (vectorstore.py:12-18)
    from llama_index.core.schema import TextNode  # type: ignore
    from llama_index.core.vector_stores.types import (  # type: ignore
        VectorStoreQuery,
        VectorStoreQueryResult,
    )
    _HAVE_LLAMAINDEX = True
except ImportError:
    _HAVE_LLAMAINDEX = False

    class TextNode:  # type: ignore[no-redef]
        """Minimal llama_index TextNode stand-in."""

        def __init__(self, text: str = "", id_: str = "",
                     metadata: dict | None = None, embedding=None):
            self.text = text
            self.node_id = id_
            self.metadata = metadata or {}
            self.embedding = embedding

        def get_content(self) -> str:
            return self.text

        def get_embedding(self):
            return self.embedding

    class VectorStoreQuery:  # type: ignore[no-redef]
        def __init__(self, query_embedding=None, similarity_top_k: int = 10):
            self.query_embedding = query_embedding
            self.similarity_top_k = similarity_top_k

    class VectorStoreQueryResult:  # type: ignore[no-redef]
        def __init__(self, nodes=None, similarities=None, ids=None):
            self.nodes = nodes or []
            self.similarities = similarities or []
            self.ids = ids or []


def _stable_hash_id(value: str) -> int:
    h = hashlib.sha256(value.encode("utf-8")).digest()
    return int.from_bytes(h[:8], byteorder="big") & 0x7FFFFFFFFFFFFFFF


_RESERVED = {"id", "vector", "text", "node_id", "score", "_bm25_score"}


class VelesDBVectorStore:
    """LlamaIndex-compatible vector store (vectorstore.py:59-742)."""

    stores_text = True

    def __init__(self, spark=None, path: Optional[str] = None,
                 collection_name: str = "llamaindex",
                 metric: str = "cosine", **kwargs: Any) -> None:
        from velesdb_spark.database import Database
        from velesdb_spark.integrations.security import (
            validate_collection_name, validate_metric, validate_path)
        from velesdb_spark.session import get_spark

        if path is not None:
            path = validate_path(path)
        self.collection_name = validate_collection_name(collection_name)
        self.metric = validate_metric(metric)
        self._spark = spark or get_spark("velesdb-llamaindex")
        self._db = Database.open(self._spark, path)
        self._collection = None

    # ------------------------------------------------------------ plumbing
    @property
    def client(self):
        return self._db

    def _get_db(self):
        return self._db

    def _get_collection(self, dimension: int):
        if self._collection is None:
            if self.collection_name in self._db.collections:
                self._collection = self._db.get_collection(
                    self.collection_name)
            else:
                self._collection = self._db.create_collection(
                    self.collection_name, dimension=dimension,
                    metric=self.metric, text_col="text")
        return self._collection

    def _hydrate_ranked(self, collection, ranked) -> VectorStoreQueryResult:
        """(id, score) pairs → full nodes via ONE isin scan, keeping the
        ranked order."""
        from pyspark.sql import functions as F

        rows = {int(r[collection.id_col]): r.asDict(recursive=True)
                for r in collection.df.filter(F.col(collection.id_col).isin(
                    [i for i, _ in ranked])).collect()}
        nodes, sims, ids = [], [], []
        for iid, score in ranked:
            row = rows.get(iid, {})
            nid = row.get("node_id") or str(iid)
            meta = {k: v for k, v in row.items()
                    if k not in _RESERVED and not k.startswith("_vql")
                    and v is not None}
            nodes.append(TextNode(text=row.get("text") or "", id_=nid,
                                  metadata=meta))
            sims.append(score)
            ids.append(nid)
        return VectorStoreQueryResult(nodes=nodes, similarities=sims,
                                      ids=ids)

    def _rows_to_result(self, df) -> VectorStoreQueryResult:
        nodes, sims, ids = [], [], []
        for r in df.collect():
            row = r.asDict(recursive=True)
            nid = row.get("node_id") or str(row.get("id", ""))
            meta = {k: v for k, v in row.items()
                    if k not in _RESERVED and not k.startswith("_vql")
                    and v is not None}
            nodes.append(TextNode(text=row.get("text") or "", id_=nid,
                                  metadata=meta))
            sims.append(float(row.get("score",
                                      row.get("_bm25_score", 0.0)) or 0.0))
            ids.append(nid)
        return VectorStoreQueryResult(nodes=nodes, similarities=sims,
                                      ids=ids)

    # ------------------------------------------------------------- writes
    def add(self, nodes: List[Any], **add_kwargs: Any) -> List[str]:
        """vectorstore.py:190-256 — flattened node rows, one upsert."""
        if not nodes:
            return []
        validate_batch_size(len(nodes))
        first = nodes[0].get_embedding()
        if first is None:
            raise ValueError("Nodes must have embeddings")
        collection = self._get_collection(len(first))
        points, ids = [], []
        for node in nodes:
            emb = node.get_embedding()
            if emb is None:
                continue
            nid = node.node_id
            ids.append(nid)
            row = {"id": _stable_hash_id(nid),
                   "vector": [float(x) for x in emb],
                   "text": node.get_content(), "node_id": nid}
            if getattr(node, "metadata", None):
                for k, v in node.metadata.items():
                    # reserved row fields never get shadowed by metadata
                    if k not in row and isinstance(v, (str, int, float,
                                                       bool)):
                        row[k] = v
            points.append(row)
        if points:
            keys: list[str] = []
            for p in points:
                for k in p:
                    if k not in keys:
                        keys.append(k)
            collection.upsert([{k: p.get(k) for k in keys} for p in points])
        return ids

    add_bulk = add

    def delete(self, ref_doc_id: str, **delete_kwargs: Any) -> None:
        if self._collection is None:
            return
        self._collection.delete([_stable_hash_id(ref_doc_id)])

    # ------------------------------------------------------------ queries
    def query(self, query: Any, **kwargs: Any) -> VectorStoreQueryResult:
        """vectorstore.py:271-332 — exact top-k over the collection."""
        if query.query_embedding is None:
            return VectorStoreQueryResult(nodes=[], similarities=[], ids=[])
        collection = self._get_collection(len(query.query_embedding))
        k = validate_k(query.similarity_top_k or 10)
        return self._rows_to_result(
            collection.search(query.query_embedding, k))

    def query_with_score_threshold(
            self, query: Any, score_threshold: float = 0.0,
            **kwargs: Any) -> VectorStoreQueryResult:
        result = self.query(query, **kwargs)
        if score_threshold > 0.0 and result.similarities:
            keep = [i for i, s in enumerate(result.similarities)
                    if s >= score_threshold]
            return VectorStoreQueryResult(
                nodes=[result.nodes[i] for i in keep],
                similarities=[result.similarities[i] for i in keep],
                ids=[result.ids[i] for i in keep])
        return result

    def hybrid_query(self, query_str: str, query_embedding: List[float],
                     similarity_top_k: int = 10, vector_weight: float = 0.5,
                     **kwargs: Any) -> VectorStoreQueryResult:
        """RRF vector ∪ BM25 (vectorstore.py:378-448)."""
        validate_text(query_str)
        validate_k(similarity_top_k)
        validate_weight(vector_weight, "vector_weight")
        collection = self._get_collection(len(query_embedding))
        fused = collection.hybrid_search(
            query=query_str, vector=query_embedding, k=similarity_top_k,
            vector_weight=vector_weight)
        # fused result is (id, score); hydrate nodes in ranking order
        ranked = [(int(r[collection.id_col]), float(r["score"]))
                  for r in fused.collect()]
        return self._hydrate_ranked(collection, ranked)

    def text_query(self, query_str: str, similarity_top_k: int = 10,
                   **kwargs: Any) -> VectorStoreQueryResult:
        validate_text(query_str)
        validate_k(similarity_top_k)
        if self._collection is None:
            return VectorStoreQueryResult(nodes=[], similarities=[], ids=[])
        return self._rows_to_result(
            self._collection.text_search(query_str, similarity_top_k))

    def batch_query(self, queries: List[Any],
                    **kwargs: Any) -> List[VectorStoreQueryResult]:
        """One Spark job for the whole batch (vectorstore.py:508-548)."""
        if not queries:
            return []
        validate_batch_size(len(queries))
        live = [q for q in queries if q.query_embedding is not None]
        if not live:
            return [VectorStoreQueryResult(nodes=[], similarities=[], ids=[])
                    for _ in queries]
        collection = self._get_collection(len(live[0].query_embedding))
        df = collection.batch_search(searches=[
            {"vector": q.query_embedding,
             "top_k": q.similarity_top_k or 10} for q in live])
        from velesdb_spark.functions.distance import higher_is_better

        rows_by_qid: dict[int, list] = {i: [] for i in range(len(live))}
        for r in df.collect():
            row = r.asDict(recursive=True)
            rows_by_qid[int(row.pop("qid"))].append(row)
        # metric direction, matching topk._best_order: distance metrics
        # (euclidean, hamming) rank ascending, similarities descending
        hib = higher_is_better(collection.metric)
        out, li = [], 0
        for q in queries:
            if q.query_embedding is None:
                out.append(VectorStoreQueryResult(
                    nodes=[], similarities=[], ids=[]))
                continue
            # missing score ranks LAST under either direction (advisor
            # r6: coercing to 0.0 ranked nulls first on distance metrics)
            missing = float("-inf") if hib else float("inf")
            rows = sorted(rows_by_qid[li],
                          key=lambda r: (missing if r.get("score") is None
                                         else float(r["score"])),
                          reverse=hib)
            li += 1
            nodes, sims, ids = [], [], []
            for row in rows:
                nid = row.get("node_id") or str(row.get("id", ""))
                meta = {k: v for k, v in row.items()
                        if k not in _RESERVED and not k.startswith("_vql")
                        and v is not None}
                nodes.append(TextNode(text=row.get("text") or "", id_=nid,
                                      metadata=meta))
                sims.append(float(row.get("score", 0.0) or 0.0))
                ids.append(nid)
            out.append(VectorStoreQueryResult(nodes=nodes, similarities=sims,
                                              ids=ids))
        return out

    def multi_query_search(self, query_embeddings: List[List[float]],
                           similarity_top_k: int = 10, fusion: str = "rrf",
                           fusion_params: Optional[dict] = None,
                           **kwargs: Any) -> VectorStoreQueryResult:
        """Fused MQG search (vectorstore.py:649-742); unknown fusion
        names fall back to rrf like the reference (:707-708)."""
        if not query_embeddings:
            return VectorStoreQueryResult(nodes=[], similarities=[], ids=[])
        collection = self._get_collection(len(query_embeddings[0]))
        if fusion not in ("rrf", "average", "maximum", "weighted"):
            fusion, fusion_params = "rrf", {"k": 60}
        fused = collection.multi_query_search(
            query_embeddings, similarity_top_k, strategy=fusion,
            fusion_params=fusion_params)
        ranked = [(int(r[collection.id_col]), float(r["score"]))
                  for r in fused.select(collection.id_col, "score").collect()]
        return self._hydrate_ranked(collection, ranked)

    def velesql(self, query_str: str, params: Optional[dict] = None,
                **kwargs: Any) -> VectorStoreQueryResult:
        if self._collection is None:
            return VectorStoreQueryResult(nodes=[], similarities=[], ids=[])
        return self._rows_to_result(self._collection.query(query_str, params))

    # ------------------------------------------------------------- lookups
    def get_nodes(self, node_ids: List[str], **kwargs: Any) -> List[TextNode]:
        """One isin scan, fused order by requested ids
        (vectorstore.py:583-596)."""
        if not node_ids or self._collection is None:
            return []
        from pyspark.sql import functions as F

        col = self._collection
        int_ids = [_stable_hash_id(nid) for nid in node_ids]
        rows = {int(r[col.id_col]): r.asDict(recursive=True)
                for r in col.df.filter(
                    F.col(col.id_col).isin(int_ids)).collect()}
        out = []
        for iid in int_ids:
            if iid in rows:
                row = rows[iid]
                meta = {k: v for k, v in row.items()
                        if k not in _RESERVED and not k.startswith("_vql")
                        and v is not None}
                out.append(TextNode(text=row.get("text") or "",
                                    id_=row.get("node_id") or "",
                                    metadata=meta))
        return out

    def get_collection_info(self) -> dict:
        if self._collection is None:
            return {"name": self.collection_name, "dimension": 0,
                    "metric": self.metric, "point_count": 0}
        return self._collection.info()

    def flush(self) -> None:
        if self._collection is not None:
            self._collection.flush()

    def is_empty(self) -> bool:
        return self._collection is None or self._collection.is_empty()

    def create_metadata_collection(self, name: str) -> None:
        self._db.create_metadata_collection(name)

    def is_metadata_only(self) -> bool:
        return (self._collection is not None
                and self._collection.is_metadata_only())

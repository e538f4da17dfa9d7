"""LangChain VectorStore adapter over the Spark-native engine.

Reference: integrations/langchain/src/langchain_velesdb/vectorstore.py —
the complete VelesDBVectorStore surface (add_texts/similarity_search
family, hybrid/text search, batch + multi-query with fusion, VelesQL
passthrough, metadata collections), re-expressed over
``velesdb_spark.database``. An application using ``langchain_velesdb``
switches by constructing this class with a SparkSession; every public
method keeps the reference's name, signature shape, and return types.

``langchain_core`` is optional: when importable, Document /
VectorStoreRetriever are the real LangChain classes (so the store plugs
into chains unchanged); otherwise lightweight stand-ins with the same
attributes are used, keeping the adapter testable without the package.

Scale shape: all ranking work stays in Spark plans (exact top-k =
TakeOrderedAndProject, hybrid = two ranked legs + RRF, batch = one scan
scoring every query); only the final ≤ k rows per query are collected
into Documents at the boundary.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable, List, Optional, Tuple

from velesdb_spark.integrations.security import (
    validate_batch_size,
    validate_collection_name,
    validate_k,
    validate_metric,
    validate_path,
    validate_query,
    validate_storage_mode,
    validate_text,
    validate_weight,
)

try:  # real LangChain types when available (vectorstore.py:13-15)
    from langchain_core.documents import Document  # type: ignore
    _HAVE_LANGCHAIN = True
except ImportError:  # stand-in with the same two attributes
    _HAVE_LANGCHAIN = False

    class Document:  # type: ignore[no-redef]
        """Minimal langchain_core.documents.Document stand-in."""

        def __init__(self, page_content: str = "", metadata: dict | None = None):
            self.page_content = page_content
            self.metadata = metadata or {}

        def __eq__(self, other):
            return (isinstance(other, Document)
                    and self.page_content == other.page_content
                    and self.metadata == other.metadata)

        def __repr__(self):
            return f"Document(page_content={self.page_content!r})"


def _stable_hash_id(value: str) -> int:
    """SHA256-based stable 63-bit id for a string id
    (vectorstore.py:36-55 — Python hash() is per-process)."""
    h = hashlib.sha256(value.encode("utf-8")).digest()
    return int.from_bytes(h[:8], byteorder="big") & 0x7FFFFFFFFFFFFFFF


def _to_int_id(id_str: str) -> int:
    """Numeric strings pass through, others hash (vectorstore.py:719-724)."""
    try:
        return int(id_str)
    except ValueError:
        return _stable_hash_id(id_str)


_RESERVED = {"id", "vector", "text", "score", "_bm25_score"}


def _row_to_doc(row: dict) -> Tuple[Document, float]:
    """(Document, score) from a collected row: text column is the page
    content, every non-reserved non-internal column is metadata."""
    text = row.get("text") or ""
    metadata = {k: v for k, v in row.items()
                if k not in _RESERVED and not k.startswith("_vql")
                and v is not None}
    score = row.get("score", row.get("_bm25_score", 0.0)) or 0.0
    return Document(page_content=text, metadata=metadata), float(score)


def _normalize_points(points: List[dict]) -> List[dict]:
    """Same-keyed rows for createDataFrame: union of metadata keys,
    missing values None (the engine stores payload fields as columns)."""
    keys: list[str] = []
    for p in points:
        for k in p:
            if k not in keys:
                keys.append(k)
    return [{k: p.get(k) for k in keys} for p in points]


class VelesDBVectorStore:
    """LangChain-compatible vector store (vectorstore.py:58-983)."""

    def __init__(self, embedding, spark=None, path: Optional[str] = None,
                 collection_name: str = "langchain", metric: str = "cosine",
                 storage_mode: str = "full", **kwargs: Any) -> None:
        from velesdb_spark.database import Database
        from velesdb_spark.session import get_spark

        if path is not None:
            path = validate_path(path)
        self._collection_name = validate_collection_name(collection_name)
        self._metric = validate_metric(metric)
        self._storage_mode = validate_storage_mode(storage_mode)
        self._embedding = embedding
        self._spark = spark or get_spark("velesdb-langchain")
        self._db = Database.open(self._spark, path)
        self._collection = None
        self._next_id = 1

    # ------------------------------------------------------------ plumbing
    @property
    def embeddings(self):
        return self._embedding

    def _get_collection(self, dimension: int):
        if self._collection is None:
            if self._collection_name in self._db.collections:
                self._collection = self._db.get_collection(
                    self._collection_name)
            else:
                self._collection = self._db.create_collection(
                    self._collection_name, dimension=dimension,
                    metric=self._metric, text_col="text",
                    storage_mode=self._storage_mode)
        return self._collection

    def _generate_id(self) -> int:
        nid = self._next_id
        self._next_id += 1
        return nid

    def _require_collection(self):
        if self._collection is None:
            raise ValueError("Collection not initialized. Add documents first.")
        return self._collection

    def _collect_docs(self, df, with_score: bool):
        rows = [r.asDict(recursive=True) for r in df.collect()]
        pairs = [_row_to_doc(r) for r in rows]
        return pairs if with_score else [d for d, _ in pairs]

    def _hydrate_ranked(self, collection,
                        ranked: List[Tuple[int, float]]
                        ) -> List[Tuple[Document, float]]:
        """(id, score) pairs → (Document, score) via ONE isin scan, keyed
        per id so a missing row drops only its own pair — a positional zip
        with get_by_ids would shift every pairing after the first gap."""
        from pyspark.sql import functions as F

        col = self._require_collection() if collection is None else collection
        rows = {int(r[col.id_col]): r.asDict(recursive=True)
                for r in col.df.filter(F.col(col.id_col).isin(
                    [i for i, _ in ranked])).collect()}
        out: List[Tuple[Document, float]] = []
        for iid, score in ranked:
            row = rows.get(iid)
            if row is None:
                continue
            row = dict(row)
            row.pop(col.id_col, None)
            row.pop(col.vector_col, None)
            out.append((_row_to_doc(row)[0], score))
        return out

    # ------------------------------------------------------------- writes
    def add_texts(self, texts: Iterable[str],
                  metadatas: Optional[List[dict]] = None,
                  ids: Optional[List[str]] = None, **kwargs: Any) -> List[str]:
        """vectorstore.py:163-229 — embed, build points, upsert; returns
        the string ids (provided ids are stable-hashed to ints)."""
        texts_list = list(texts)
        if not texts_list:
            return []
        validate_batch_size(len(texts_list))
        for t in texts_list:
            validate_text(t)
        embeddings = self._embedding.embed_documents(texts_list)
        collection = self._get_collection(len(embeddings[0]))
        result_ids: List[str] = []
        points = []
        for i, (text, emb) in enumerate(zip(texts_list, embeddings)):
            if ids and i < len(ids):
                doc_id = ids[i]
                int_id = _stable_hash_id(doc_id)
            else:
                int_id = self._generate_id()
                doc_id = str(int_id)
            result_ids.append(doc_id)
            row = {"id": int_id, "vector": [float(x) for x in emb],
                   "text": text}
            if metadatas and i < len(metadatas):
                for k, v in metadatas[i].items():
                    # reserved row fields never get shadowed by metadata
                    if k not in row and isinstance(v, (str, int, float,
                                                       bool)):
                        row[k] = v
            points.append(row)
        collection.upsert(_normalize_points(points))
        return result_ids

    # one log segment either way — the engine batches natively
    add_texts_bulk = add_texts

    def delete(self, ids: Optional[List[str]] = None,
               **kwargs: Any) -> Optional[bool]:
        """vectorstore.py:486-508. Deviation: numeric string ids resolve
        via int() first (like get_by_ids :719-724) so auto-generated ids
        round-trip — the reference hashes unconditionally here, which
        orphans its own generated ids."""
        if not ids:
            return None
        if self._collection is None:
            return False
        self._collection.delete([_to_int_id(i) for i in ids])
        return True

    # ------------------------------------------------------------ searches
    def similarity_search(self, query: str, k: int = 4,
                          **kwargs: Any) -> List[Document]:
        validate_text(query)
        validate_k(k)
        return [d for d, _ in self.similarity_search_with_score(
            query, k=k, **kwargs)]

    def similarity_search_with_score(
            self, query: str, k: int = 4,
            **kwargs: Any) -> List[Tuple[Document, float]]:
        qv = self._embedding.embed_query(query)
        collection = self._get_collection(len(qv))
        return self._collect_docs(collection.search(qv, k), with_score=True)

    def similarity_search_with_relevance_scores(
            self, query: str, k: int = 4,
            score_threshold: Optional[float] = None,
            **kwargs: Any) -> List[Tuple[Document, float]]:
        results = self.similarity_search_with_score(query, k=k, **kwargs)
        if score_threshold is not None:
            results = [(d, s) for d, s in results if s >= score_threshold]
        return results

    def similarity_search_with_filter(
            self, query: str, k: int = 4, filter: Optional[dict] = None,
            **kwargs: Any) -> List[Document]:
        qv = self._embedding.embed_query(query)
        collection = self._get_collection(len(qv))
        if filter:
            df = collection.search_with_filter(qv, filter, k)
        else:
            df = collection.search(qv, k)
        return self._collect_docs(df, with_score=False)

    def hybrid_search(self, query: str, k: int = 4,
                      vector_weight: float = 0.5,
                      filter: Optional[dict] = None,
                      **kwargs: Any) -> List[Tuple[Document, float]]:
        """RRF vector ∪ BM25 (vectorstore.py:373-438)."""
        validate_text(query)
        validate_k(k)
        validate_weight(vector_weight, "vector_weight")
        qv = self._embedding.embed_query(query)
        collection = self._get_collection(len(qv))
        df = collection.hybrid_search(query=query, vector=qv, k=k,
                                      vector_weight=vector_weight,
                                      filter_cond=filter)
        # fused result is (id, score); join text+metadata back with one
        # isin scan, preserving the fused ranking
        ranked = [(int(r[collection.id_col]), float(r["score"]))
                  for r in df.collect()]
        return self._hydrate_ranked(collection, ranked)

    def text_search(self, query: str, k: int = 4,
                    filter: Optional[dict] = None,
                    **kwargs: Any) -> List[Tuple[Document, float]]:
        """BM25 full-text ranking (vectorstore.py:439-485)."""
        validate_text(query)
        validate_k(k)
        collection = self._require_collection()
        df = collection.text_search(query, k, filter_cond=filter)
        return self._collect_docs(df, with_score=True)

    def batch_search(self, queries: List[str], k: int = 4,
                     **kwargs: Any) -> List[List[Document]]:
        """One Spark job scores every query (vectorstore.py:564-610)."""
        return [[d for d, _ in per]
                for per in self.batch_search_with_score(queries, k, **kwargs)]

    def batch_search_with_score(
            self, queries: List[str], k: int = 4,
            **kwargs: Any) -> List[List[Tuple[Document, float]]]:
        if not queries:
            return []
        from velesdb_spark.functions.distance import higher_is_better

        embs = [self._embedding.embed_query(q) for q in queries]
        collection = self._get_collection(len(embs[0]))
        df = collection.batch_search(
            searches=[{"vector": e, "top_k": k} for e in embs])
        by_qid: dict[int, list] = {i: [] for i in range(len(queries))}
        for r in df.collect():
            row = r.asDict(recursive=True)
            by_qid[int(row.pop("qid"))].append(_row_to_doc(row))
        # sort with the metric's direction: distances (euclidean, hamming)
        # rank ascending — a blanket descending sort would return worst-first
        hib = higher_is_better(collection.metric)
        return [sorted(by_qid[i], key=lambda p: p[1], reverse=hib)
                for i in range(len(queries))]

    def multi_query_search(self, queries: List[str], k: int = 4,
                           fusion: str = "rrf",
                           fusion_params: Optional[dict] = None,
                           filter: Optional[dict] = None,
                           **kwargs: Any) -> List[Document]:
        """Fused Multiple-Query-Generation search (vectorstore.py:832-954;
        fusion strategies per _build_fusion_strategy :955-983)."""
        return [d for d, _ in self.multi_query_search_with_score(
            queries, k, fusion, fusion_params, filter, **kwargs)]

    def multi_query_search_with_score(
            self, queries: List[str], k: int = 4, fusion: str = "rrf",
            fusion_params: Optional[dict] = None,
            filter: Optional[dict] = None,
            **kwargs: Any) -> List[Tuple[Document, float]]:
        if not queries:
            return []
        validate_k(k)
        validate_batch_size(len(queries))
        for q in queries:
            validate_text(q)
        if fusion.lower() not in ("average", "maximum", "rrf", "weighted"):
            raise ValueError(
                f"Unknown fusion strategy '{fusion}'. "
                "Use 'average', 'maximum', 'rrf', or 'weighted'.")
        embs = [self._embedding.embed_query(q) for q in queries]
        collection = self._get_collection(len(embs[0]))
        fused = collection.multi_query_search(
            embs, k, strategy=fusion, filter_cond=filter,
            fusion_params=fusion_params)
        # fused result carries (id, score); join text+metadata back with
        # one isin scan, keeping the fused ranking order
        ranked = [(int(r[collection.id_col]), float(r["score"]))
                  for r in fused.select(collection.id_col, "score").collect()]
        return self._hydrate_ranked(collection, ranked)

    # ------------------------------------------------------------- lookups
    def get_by_ids(self, ids: List[str], **kwargs: Any) -> List[Document]:
        """vectorstore.py:706-739 — one isin scan, not a per-id loop."""
        if not ids or self._collection is None:
            return []
        from pyspark.sql import functions as F

        col = self._collection
        int_ids = [_to_int_id(i) for i in ids]
        rows = {int(r[col.id_col]): r.asDict(recursive=True)
                for r in col.df.filter(
                    F.col(col.id_col).isin(int_ids)).collect()}
        docs: List[Document] = []
        for iid in int_ids:
            if iid in rows:
                row = dict(rows[iid])
                row.pop(col.id_col, None)
                row.pop(col.vector_col, None)
                docs.append(_row_to_doc(row)[0])
        return docs

    def query(self, query_str: str, params: Optional[dict] = None,
              **kwargs: Any) -> List[Document]:
        """VelesQL passthrough (vectorstore.py:793-831)."""
        validate_query(query_str)
        collection = self._require_collection()
        df = collection.query(query_str, params)
        return self._collect_docs(df, with_score=False)

    def get_collection_info(self) -> dict:
        if self._collection is None:
            return {"name": self._collection_name, "dimension": 0,
                    "metric": self._metric, "point_count": 0}
        return self._collection.info()

    def flush(self) -> None:
        if self._collection is not None:
            self._collection.flush()

    def is_empty(self) -> bool:
        return self._collection is None or self._collection.is_empty()

    def create_metadata_collection(self, name: str) -> None:
        """Payload-only companion collection (vectorstore.py:771-782)."""
        self._db.create_metadata_collection(validate_collection_name(name))

    def is_metadata_only(self) -> bool:
        return (self._collection is not None
                and self._collection.is_metadata_only())

    # ---------------------------------------------------------- LangChain
    @classmethod
    def from_texts(cls, texts: List[str], embedding,
                   metadatas: Optional[List[dict]] = None, spark=None,
                   path: Optional[str] = None,
                   collection_name: str = "langchain",
                   metric: str = "cosine",
                   **kwargs: Any) -> "VelesDBVectorStore":
        store = cls(embedding=embedding, spark=spark, path=path,
                    collection_name=collection_name, metric=metric, **kwargs)
        store.add_texts(texts, metadatas=metadatas)
        return store

    def as_retriever(self, **kwargs: Any):
        """Real VectorStoreRetriever when langchain_core is importable,
        else a stand-in exposing invoke/get_relevant_documents."""
        search_kwargs = kwargs.pop("search_kwargs", {})
        search_kwargs.setdefault("k", 4)
        if _HAVE_LANGCHAIN:
            from langchain_core.vectorstores import VectorStoreRetriever

            return VectorStoreRetriever(vectorstore=self,
                                        search_kwargs=search_kwargs, **kwargs)
        return _SimpleRetriever(self, search_kwargs)


class _SimpleRetriever:
    """Duck-typed VectorStoreRetriever fallback."""

    def __init__(self, store: VelesDBVectorStore, search_kwargs: dict):
        self.vectorstore = store
        self.search_kwargs = search_kwargs

    def invoke(self, query: str) -> List[Document]:
        return self.vectorstore.similarity_search(query, **self.search_kwargs)

    get_relevant_documents = invoke

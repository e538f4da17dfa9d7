#!/usr/bin/env python3
"""RAG pipeline demo — documents → chunks → embeddings → collection →
hybrid retrieval → QA context assembly.

Reference: demos/rag-pdf-demo/src/ (the second flagship demo): a PDF/text
corpus is chunked with word-boundary windows + overlap
(pdf_processor.py:82-152), each chunk embedded and upserted with a
payload of (document_name, page_number, chunk_index, chunk_id_hex)
(rag_engine.py:105-186), then queried by vector top-k with an optional
per-document filter (rag_engine.py:278-330), and the top chunks become
the LLM's answer context.

Spark-first differences from the reference (same capabilities, different
execution model):

- **Chunking is a DataFrame expression**, not a driver loop: the whole
  corpus chunks in one lazy plan (`chunk_documents_df` — pure JVM array
  ops inside whole-stage codegen), so the same code chunks 3 demo docs
  or a 100 TB corpus.
- **Embedding runs engine-side** over the chunks DataFrame. The demo
  embedder is a deterministic md5-derived vector (the container has no
  embedding model; `embed_expr` is the Spark expression, `embed_text`
  the exact driver-side twin for query strings — swap both for a real
  model via a pandas_udf without touching the pipeline).
- **Retrieval is the engine's hybrid RRF** (vector ∪ BM25,
  database.py hybrid_search) — strictly more than the reference's
  vector-only search; pass ``vector_weight=1.0`` for reference-exact
  vector search.
- Ingest upserts ONE DataFrame per document batch (one log segment),
  not a point-at-a-time loop.

Run: ``python examples/rag_pipeline.py`` (the test suite executes
``main(spark)`` end-to-end so the demo stays living documentation).
"""

from __future__ import annotations

import hashlib
from typing import Optional

DIM = 16
CHUNK_TOKENS = 40
CHUNK_OVERLAP = 8


def embed_expr(col, dim: int = DIM):
    """Deterministic md5-derived embedding as a JVM-side expression —
    the engine's shared implementation (functions/embedding.py), so the
    demo, the gated rag_retrieval query, and the DuckDB oracle can
    never drift from each other."""
    from velesdb_spark.functions.embedding import md5_embed_expr

    return md5_embed_expr(col, dim)


def embed_text(text: str, dim: int = DIM) -> list[float]:
    """Driver-side twin of embed_expr for query strings."""
    from velesdb_spark.functions.embedding import md5_embed_text

    return md5_embed_text(text, dim)


def _chunk_id(document_name: str, page: int, idx: int) -> int:
    """Deterministic 60-bit chunk id (pdf_processor.py generate_chunk_id
    + rag_engine.py:144's first-16-hex truncation, here 15 hex so the id
    stays inside a signed 64-bit int)."""
    content = f"{document_name}:{page}:{idx}"
    return int(hashlib.md5(content.encode()).hexdigest()[:15], 16)


class RagPipeline:
    """demos/rag-pdf-demo/src/rag_engine.py re-expressed over the engine:
    ingest_text / search / answer_context / list_documents /
    delete_document, with every corpus-sized step a DataFrame plan."""

    def __init__(self, spark, collection_name: str = "rag_documents",
                 chunk_tokens: int = CHUNK_TOKENS,
                 chunk_overlap: int = CHUNK_OVERLAP, dim: int = DIM):
        from velesdb_spark.database import Database

        self.spark = spark
        self.chunk_tokens = chunk_tokens
        self.chunk_overlap = chunk_overlap
        self.dim = dim
        self.db = Database.open(spark)
        if collection_name in self.db.collections:
            self.collection = self.db.get_collection(collection_name)
        else:
            self.collection = self.db.create_collection(
                collection_name, dimension=dim, metric="cosine",
                text_col="text")

    # ------------------------------------------------------------ ingest
    def ingest_documents(self, docs_df, name_col: str = "document_name",
                         text_col: str = "text",
                         page_col: Optional[str] = None) -> dict:
        """Corpus-scale ingest: chunk + embed + id every document in ONE
        lazy plan, land with ONE upsert. `docs_df` is any DataFrame with a
        document-name column and a text column (+ optional page column)."""
        from pyspark.sql import functions as F

        from velesdb_spark.functions.text_analysis import chunk_tokens

        page = F.col(page_col) if page_col else F.lit(1)
        chunks = (docs_df
                  .select(F.col(name_col).alias("document_name"),
                          page.cast("int").alias("page_number"),
                          F.col(text_col).alias("_text"))
                  .select("document_name", "page_number",
                          F.posexplode(
                              chunk_tokens(F.col("_text"),
                                           self.chunk_tokens,
                                           self.chunk_overlap))
                          .alias("chunk_index", "text")))
        # deterministic chunk id: md5(doc:page:idx) first 15 hex → bigint
        # (rag_engine.py:144 truncates the same hash to a u64)
        hexid = F.md5(F.concat_ws(
            ":", "document_name", F.col("page_number").cast("string"),
            F.col("chunk_index").cast("string")))
        points = chunks.select(
            F.conv(F.substring(hexid, 1, 15), 16, 10).cast("bigint")
            .alias("id"),
            embed_expr(F.col("text"), self.dim).cast("array<float>")
            .alias("vector"),
            "text", "document_name", "page_number", "chunk_index",
            hexid.alias("chunk_id_hex"))
        # persist so upsert and the chunks_created count share one
        # evaluation of the chunk+embed plan (advisor r6: counting the
        # lazy frame after upsert recomputed the whole pipeline)
        points = points.persist()
        try:
            n = points.count()
            self.collection.upsert(points)
        finally:
            points.unpersist()
        return {"success": True, "chunks_created": n}

    def ingest_text(self, text: str, document_name: str) -> dict:
        """Single-document convenience (rag_engine.py ingest_text)."""
        df = self.spark.createDataFrame(
            [(document_name, text)], "document_name string, text string")
        out = self.ingest_documents(df)
        out["document_name"] = document_name
        return out

    # ------------------------------------------------------------ query
    def search(self, query: str, top_k: int = 5,
               document_filter: Optional[str] = None,
               vector_weight: float = 0.5):
        """Hybrid retrieval (vector ∪ BM25 RRF) with the reference's
        optional per-document filter (rag_engine.py:301-304). Returns the
        fused (id, score) DataFrame joined back to chunk payloads."""
        from pyspark.sql import functions as F

        filt = ({"type": "eq", "field": "document_name",
                 "value": document_filter} if document_filter else None)
        fused = self.collection.hybrid_search(
            query=query, vector=embed_text(query, self.dim), k=top_k,
            vector_weight=vector_weight, filter_cond=filt)
        payload = self.collection.df.select(
            "id", "text", "document_name", "page_number", "chunk_index")
        return (fused.join(payload, "id")
                .orderBy(F.desc("score"), F.asc("id")))

    def answer_context(self, query: str, top_k: int = 3,
                       document_filter: Optional[str] = None) -> dict:
        """QA context assembly: the top-k chunks rendered as a citation
        block (what the demo feeds the LLM). Only top_k rows ever reach
        the driver."""
        rows = self.search(query, top_k, document_filter).collect()
        context = "\n\n".join(
            f"[{r['document_name']} p.{r['page_number']}] {r['text']}"
            for r in rows)
        citations = [{"document_name": r["document_name"],
                      "page_number": r["page_number"],
                      "chunk_index": r["chunk_index"],
                      "score": float(r["score"])} for r in rows]
        return {"query": query, "context": context, "citations": citations}

    # ------------------------------------------------------ management
    def list_documents(self) -> list[dict]:
        """Per-document chunk/page counts from the collection itself —
        one groupBy, not a driver-side registry scan (the reference
        rebuilds this by top_k=ALL search, rag_engine.py:37-103)."""
        from pyspark.sql import functions as F

        return [r.asDict() for r in
                self.collection.df.groupBy("document_name")
                .agg(F.count("*").alias("chunks"),
                     F.countDistinct("page_number").alias("pages"))
                .orderBy("document_name").collect()]

    def delete_document(self, document_name: str) -> dict:
        """Delete all of a document's chunks in one filtered id scan +
        one tombstone batch (the reference deletes chunk-by-chunk,
        rag_engine.py:341-380)."""
        ids = [r["id"] for r in self.collection.df.filter(
            self.collection.df["document_name"] == document_name)
            .select("id").collect()]
        if ids:
            self.collection.delete(ids)
        return {"deleted": len(ids)}


DOCS = [
    ("spark-guide.txt",
     "Apache Spark executes declarative DataFrame plans through the "
     "Catalyst optimizer which prunes columns and pushes filters down to "
     "the parquet scan. Adaptive query execution re-plans shuffles at "
     "runtime using observed partition sizes. Broadcast joins avoid "
     "shuffling the large fact table entirely when one side is small. "
     "Whole stage code generation fuses operators into a single JVM "
     "function to keep hot loops tight."),
    ("vector-search.txt",
     "Vector similarity search ranks documents by cosine distance "
     "between embedding vectors. Approximate indexes trade a little "
     "recall for large speedups: inverted file lists cluster vectors "
     "around centroids while locality sensitive hashing buckets them by "
     "random hyperplanes. Product quantization compresses vectors into "
     "byte codes so a billion embeddings fit in memory."),
    ("rag-systems.txt",
     "Retrieval augmented generation grounds a language model in an "
     "external corpus. Documents are chunked with overlap, embedded and "
     "stored in a vector collection. At question time the query is "
     "embedded, the nearest chunks are retrieved, optionally fused with "
     "keyword scores, and the winning passages are stitched into the "
     "prompt as context with citations."),
]


def main(spark=None, verbose: bool = True):
    """End-to-end: ingest 3 docs, hybrid-retrieve, assemble QA context,
    filtered search, delete one document. Returns the artifacts so the
    test can assert on them."""
    if spark is None:
        import os
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from velesdb_spark.session import get_spark

        spark = get_spark("rag-pipeline-demo")

    rag = RagPipeline(spark, collection_name="rag_demo")
    docs_df = spark.createDataFrame(DOCS, "document_name string, text string")
    stats = rag.ingest_documents(docs_df)
    if verbose:
        print(f"ingested {stats['chunks_created']} chunks from "
              f"{len(DOCS)} documents")

    q = "how does retrieval augmented generation use chunk embeddings"
    hits = rag.search(q, top_k=5).collect()
    if verbose:
        for r in hits:
            print(f"  {r['score']:.4f}  {r['document_name']} "
                  f"#{r['chunk_index']}: {r['text'][:60]}...")

    ctx = rag.answer_context(q, top_k=3)
    if verbose:
        print("--- context ---")
        print(ctx["context"][:400])

    filtered = rag.search("catalyst optimizer shuffles", top_k=3,
                          document_filter="spark-guide.txt").collect()
    listing = rag.list_documents()
    deleted = rag.delete_document("vector-search.txt")
    remaining = rag.list_documents()
    if verbose:
        print(f"documents: {[d['document_name'] for d in listing]}, "
              f"deleted {deleted['deleted']} chunks, "
              f"remaining: {[d['document_name'] for d in remaining]}")
    return {"stats": stats, "hits": hits, "context": ctx,
            "filtered": filtered, "listing": listing,
            "deleted": deleted, "remaining": remaining}


if __name__ == "__main__":
    main()

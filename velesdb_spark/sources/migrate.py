"""Migration sources: load vector-store exports into Collections.

Reference: crates/velesdb-migrate/ — importers for Qdrant, Pinecone and
Supabase/pgvector. The reference streams REST scroll pages; here each source
is a deterministic file reader (JSONL exports / pgvector CSV) that lands in
a Collection with the same (id, vector, payload-columns) shape. At scale the
JSONL read is a distributed `spark.read.json` — schema inferred once, then
column-pruned.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velesdb_spark.database import Collection


def _to_collection(spark: SparkSession, df: DataFrame, name: str,
                   metric: str, dimension: Optional[int]) -> Collection:
    coll = Collection(spark, name, dimension, metric)
    coll.upsert(df)
    return coll


def read_qdrant_export(spark: SparkSession, path: str, name: str = "imported",
                       metric: str = "cosine",
                       dimension: Optional[int] = None) -> Collection:
    """Qdrant scroll-export JSONL: {"id": ..., "vector": [...],
    "payload": {...}} per line. Payload keys become top-level columns."""
    raw = spark.read.json(path)
    cols = [F.col("id").cast("long").alias("id"),
            F.col("vector").cast("array<float>").alias("vector")]
    if "payload" in raw.columns:
        pf = [f.name for f in raw.schema["payload"].dataType.fields]  # type: ignore[union-attr]
        cols += [F.col(f"payload.{p}").alias(p) for p in pf]
    return _to_collection(spark, raw.select(*cols), name, metric, dimension)


def read_pinecone_export(spark: SparkSession, path: str, name: str = "imported",
                         metric: str = "cosine",
                         dimension: Optional[int] = None) -> Collection:
    """Pinecone fetch-export JSONL: {"id": "...", "values": [...],
    "metadata": {...}} — ids may be strings; non-numeric ids get a dense
    surrogate via hash (documented lossy rename, kept in ``orig_id``)."""
    raw = spark.read.json(path)
    idc = F.col("id").try_cast("long").isNotNull()  # ANSI-safe numeric probe
    base = raw.select(
        F.when(idc, F.col("id").try_cast("long"))
         .otherwise(F.abs(F.xxhash64(F.col("id")))).alias("id"),
        F.col("id").cast("string").alias("orig_id"),
        F.col("values").cast("array<float>").alias("vector"),
        *( [F.col(f"metadata.{f.name}").alias(f.name)
            for f in raw.schema["metadata"].dataType.fields]  # type: ignore[union-attr]
           if "metadata" in raw.columns else [] ),
    )
    return _to_collection(spark, base, name, metric, dimension)


def read_pgvector_csv(spark: SparkSession, path: str, name: str = "imported",
                      metric: str = "cosine", vector_col: str = "embedding",
                      dimension: Optional[int] = None) -> Collection:
    """Supabase/pgvector CSV export where the vector column is the pgvector
    text form '[0.1,0.2,...]'."""
    raw = spark.read.option("header", "true").csv(path)
    vec = F.transform(
        F.split(F.regexp_replace(F.col(vector_col), r"[\[\]]", ""), ","),
        lambda x: x.cast("float"))
    out = raw.withColumn("vector", vec).drop(vector_col) \
        .withColumn("id", F.col("id").cast("long"))
    return _to_collection(spark, out, name, metric, dimension)

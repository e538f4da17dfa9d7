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


def read_csv_vectors(spark: SparkSession, path: str, name: str = "imported",
                     metric: str = "cosine", id_column: str = "id",
                     vector_column: str = "vector",
                     vector_spread: bool = False, dim_prefix: str = "dim_",
                     delimiter: str = ",", has_header: bool = True,
                     dimension: Optional[int] = None) -> Collection:
    """General CSV vector import — the reference's CsvFileConnector
    surface (connectors/csv_file.rs; behaviors from csv_file_tests.rs):

    - JSON-array vector column '[0.1, 0.2, 0.3]' (default), or
      ``vector_spread=True`` gathering ``dim_0, dim_1, …`` columns in
      numeric order;
    - any single-char ``delimiter`` (tab-separated exports included);
    - ``has_header=False`` names columns ``col_0, col_1, …`` (the
      reference's no-header convention);
    - a missing id/vector column raises instead of importing garbage.

    Distributed end-to-end: spark.read.csv splits the file; the vector
    parse is a JVM split/transform, never a Python loop.
    """
    raw = (spark.read.option("header", str(has_header).lower())
           .option("delimiter", delimiter).csv(path))
    if not has_header:
        raw = raw.toDF(*[f"col_{i}" for i in range(len(raw.columns))])
    if vector_spread:
        dims = sorted((c for c in raw.columns if c.startswith(dim_prefix)),
                      key=lambda c: int(c[len(dim_prefix):]))
        if not dims:
            raise ValueError(
                f"no '{dim_prefix}*' columns found for vector_spread")
        vec = F.array(*[F.col(c).cast("float") for c in dims])
        drop = dims
    else:
        if vector_column not in raw.columns:
            raise ValueError(
                f"vector column {vector_column!r} not in CSV "
                f"(columns: {raw.columns})")
        vec = F.transform(
            F.split(F.regexp_replace(F.col(vector_column),
                                     r"[\[\] ]", ""), ","),
            lambda x: x.cast("float"))
        drop = [vector_column]
    if id_column not in raw.columns:
        raise ValueError(f"id column {id_column!r} not in CSV")
    # stage under a temp name: when vector_column == "vector",
    # withColumn("vector", …) + drop(vector_column) would drop the result
    out = (raw.withColumn("__vec", vec).drop(*drop)
           .withColumnRenamed("__vec", "vector"))
    # same surrogate convention as read_pinecone_export: numeric ids
    # keep their value, others hash (original kept in orig_id)
    numeric = F.col(id_column).try_cast("long").isNotNull()
    out = (out.withColumn("orig_id", F.col(id_column).cast("string"))
           .withColumn("id", F.when(numeric,
                                    F.col(id_column).try_cast("long"))
                       .otherwise(F.abs(F.xxhash64(F.col(id_column))))))
    if id_column != "id":
        out = out.drop(id_column)
    return _to_collection(spark, out, name, metric, dimension)


def read_json_vectors(spark: SparkSession, path: str, name: str = "imported",
                      metric: str = "cosine", array_path: str = "",
                      id_field: str = "id", vector_field: str = "vector",
                      payload_fields: Optional[list] = None,
                      dimension: Optional[int] = None) -> Collection:
    """Single-document JSON vector import — the reference's
    JsonFileConnector surface (connectors/json_file.rs; behaviors from
    json_file_tests.rs):

    - root array or a dotted ``array_path`` ('data.vectors');
    - rows missing ``id_field`` get position ids ``row_0, row_1, …``;
    - ``payload_fields`` limits carried fields (empty/None = everything
      except id and vector);
    - invalid JSON raises at read time.

    A single JSON DOCUMENT is not splittable, so — like the reference's
    serde_json full-file parse — the parse is one unit of work; the
    batch/offset pagination of the REST connector era maps to DataFrame
    laziness here. Scale path: JSONL exports via read_qdrant_export /
    read_pinecone_export (splittable spark.read.json).
    """
    import json

    with open(path, encoding="utf-8") as fh:
        doc = json.load(fh)          # raises on invalid JSON, like connect()
    for part in filter(None, array_path.split(".")):
        if not isinstance(doc, dict) or part not in doc:
            raise ValueError(f"array_path {array_path!r} not found")
        doc = doc[part]
    if not isinstance(doc, list):
        raise ValueError("array_path must resolve to a JSON array")
    rows = []
    for i, item in enumerate(doc):
        vec = item.get(vector_field)
        if vec is None:
            raise ValueError(f"row {i} missing vector field "
                             f"{vector_field!r}")
        rid = str(item.get(id_field, f"row_{i}"))
        keep = payload_fields or [k for k in item
                                  if k not in (id_field, vector_field)]
        payload = {k: item[k] for k in keep if k in item}
        rows.append((rid, [float(x) for x in vec],
                     json.dumps(payload, sort_keys=True)))
    df = spark.createDataFrame(
        rows, "orig_id string, vector array<float>, payload string")
    # same surrogate convention as read_pinecone_export: numeric string
    # ids keep their value, others hash (original kept in orig_id)
    numeric = F.col("orig_id").try_cast("long").isNotNull()
    df = df.withColumn(
        "id", F.when(numeric, F.col("orig_id").try_cast("long"))
        .otherwise(F.abs(F.xxhash64(F.col("orig_id")))))
    return _to_collection(spark, df, name, metric, dimension)

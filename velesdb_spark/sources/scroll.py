"""Live migration sources: REST scroll/pagination clients → Collections.

Reference: crates/velesdb-migrate/src/connectors/{qdrant,pinecone}.rs
(scroll-paginated extraction over HTTP with api-key auth) and retry.rs
(exponential backoff with max-delay cap and optional jitter).

Design: the HTTP layer is an injectable ``transport`` callable
``(method, url, headers, json_body) -> dict`` — stdlib urllib by default,
a fake in tests, and swappable for any client in production. Each scroll
page lands as an upsert batch into the target Collection, so a durable
(path-backed) collection turns every page into an immutable log segment:
the migration is resumable from the last committed offset and
read-your-writes consistent while it runs.

Scale note: a scroll cursor is inherently sequential — the parallel axis
at 100 TB is collections/shards/namespaces, one cursor each (the
reference's pipeline.rs runs one connector stream per source for the same
reason). Page batches are created directly on the driver and written as
parquet segments; Spark never holds more than one page in memory.
"""

from __future__ import annotations

import json
import time
import urllib.request
from dataclasses import dataclass
from typing import Callable, Iterator, Optional, Sequence

from pyspark.sql import SparkSession

Transport = Callable[[str, str, dict, Optional[dict]], dict]


def urllib_transport(method: str, url: str, headers: dict,
                     body: Optional[dict]) -> dict:
    """Default stdlib transport (no extra dependencies)."""
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json",
                                          **headers})
    with urllib.request.urlopen(req) as resp:  # noqa: S310 — caller-supplied URL
        return json.loads(resp.read().decode())


# ------------------------------------------------------------ retry (retry.rs)

@dataclass
class RetryConfig:
    """retry.rs:15-63 — exponential backoff with cap; jitter optional
    (deterministic seed injection keeps tests reproducible)."""

    max_retries: int = 3
    initial_delay_s: float = 0.5
    max_delay_s: float = 30.0
    backoff_multiplier: float = 2.0
    add_jitter: bool = True

    @classmethod
    def for_rate_limits(cls) -> "RetryConfig":
        return cls(max_retries=5, initial_delay_s=1.0, max_delay_s=60.0)

    @classmethod
    def for_transient_errors(cls) -> "RetryConfig":
        return cls(max_retries=3, initial_delay_s=0.1, max_delay_s=5.0)

    def delays(self, rng=None) -> Iterator[float]:
        d = self.initial_delay_s
        for _ in range(self.max_retries):
            out = min(d, self.max_delay_s)
            if self.add_jitter and rng is not None:
                out *= 0.5 + rng.random() / 2  # 50-100% of the backoff step
            yield out
            d *= self.backoff_multiplier


def with_retry(fn: Callable[[], dict], cfg: RetryConfig = RetryConfig(),
               sleep: Callable[[float], None] = time.sleep,
               rng=None) -> dict:
    """Run ``fn``; on exception retry up to max_retries with backoff."""
    last: Optional[Exception] = None
    delays = cfg.delays(rng)
    for attempt in range(cfg.max_retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — transport errors are opaque
            last = e
            if attempt == cfg.max_retries:
                break
            sleep(next(delays))
    raise last  # type: ignore[misc]


# ------------------------------------------------------------ scroll sources

class QdrantScrollSource:
    """Scroll pagination over a live Qdrant collection
    (connectors/qdrant.rs: POST /collections/{c}/points/scroll with
    limit/offset, api-key header; pages end when next_page_offset is
    null)."""

    def __init__(self, url: str, collection: str,
                 api_key: Optional[str] = None, page_size: int = 1000,
                 transport: Transport = urllib_transport,
                 retry: RetryConfig = RetryConfig(),
                 sleep: Callable[[float], None] = time.sleep):
        self.base = url.rstrip("/")
        self.collection = collection
        self.api_key = api_key
        self.page_size = page_size
        self.transport = transport
        self.retry = retry
        self.sleep = sleep

    def _headers(self) -> dict:
        return {"api-key": self.api_key} if self.api_key else {}

    def pages(self, offset=None) -> Iterator[list[dict]]:
        """Yield scroll pages of {"id", "vector", "payload"} dicts,
        starting at ``offset`` (pass a stored offset to resume)."""
        url = (f"{self.base}/collections/{self.collection}/points/scroll")
        while True:
            body = {"limit": self.page_size, "with_payload": True,
                    "with_vector": True}
            if offset is not None:
                body["offset"] = offset
            resp = with_retry(
                lambda: self.transport("POST", url, self._headers(), body),
                self.retry, self.sleep)
            result = resp.get("result", {})
            points = result.get("points", [])
            if points:
                yield points
            offset = result.get("next_page_offset")
            if offset is None:
                return


class PineconeScrollSource:
    """List/fetch pagination over a live Pinecone index
    (connectors/pinecone.rs: GET /vectors/list?paginationToken=...,
    then GET /vectors/fetch?ids=... per page; Api-Key header)."""

    def __init__(self, url: str, namespace: str = "",
                 api_key: Optional[str] = None, page_size: int = 100,
                 transport: Transport = urllib_transport,
                 retry: RetryConfig = RetryConfig(),
                 sleep: Callable[[float], None] = time.sleep):
        self.base = url.rstrip("/")
        self.namespace = namespace
        self.api_key = api_key
        self.page_size = page_size
        self.transport = transport
        self.retry = retry
        self.sleep = sleep

    def _headers(self) -> dict:
        return {"Api-Key": self.api_key} if self.api_key else {}

    def pages(self, token: Optional[str] = None) -> Iterator[list[dict]]:
        from urllib.parse import quote

        while True:
            # query params are percent-encoded: ids/namespaces/tokens may
            # contain '&', '#', '+', spaces — raw interpolation would
            # silently fetch the wrong vectors
            url = (f"{self.base}/vectors/list?limit={self.page_size}"
                   + (f"&namespace={quote(self.namespace, safe='')}"
                      if self.namespace else "")
                   + (f"&paginationToken={quote(token, safe='')}"
                      if token else ""))
            listing = with_retry(
                lambda: self.transport("GET", url, self._headers(), None),
                self.retry, self.sleep)
            ids = [v["id"] for v in listing.get("vectors", [])]
            if ids:
                fetch_url = (f"{self.base}/vectors/fetch?"
                             + "&".join(f"ids={quote(i, safe='')}"
                                        for i in ids)
                             + (f"&namespace={quote(self.namespace, safe='')}"
                                if self.namespace else ""))
                fetched = with_retry(
                    lambda: self.transport("GET", fetch_url, self._headers(),
                                           None),
                    self.retry, self.sleep)
                vecs = fetched.get("vectors", {})
                yield [{"id": i, "values": vecs[i].get("values"),
                        "metadata": vecs[i].get("metadata")}
                       for i in ids if i in vecs]
            token = (listing.get("pagination") or {}).get("next")
            if not token:
                return


class ChromaDBScrollSource:
    """Offset pagination over a ChromaDB collection
    (connectors/chromadb.rs: POST /api/v1/collections/{c}/get with
    limit/offset/include; columnar response)."""

    def __init__(self, url: str, collection: str, page_size: int = 500,
                 transport: Transport = urllib_transport,
                 retry: RetryConfig = RetryConfig(),
                 sleep: Callable[[float], None] = time.sleep):
        self.base = url.rstrip("/")
        self.collection = collection
        self.page_size = page_size
        self.transport = transport
        self.retry = retry
        self.sleep = sleep

    def pages(self, offset: int = 0) -> Iterator[list[dict]]:
        url = f"{self.base}/api/v1/collections/{self.collection}/get"
        while True:
            body = {"limit": self.page_size, "offset": offset,
                    "include": ["embeddings", "metadatas", "documents"]}
            resp = with_retry(
                lambda: self.transport("POST", url, {}, body),
                self.retry, self.sleep)
            ids = resp.get("ids", [])
            if not ids:
                return
            embs = resp.get("embeddings") or [None] * len(ids)
            metas = resp.get("metadatas") or [None] * len(ids)
            docs = resp.get("documents") or [None] * len(ids)
            page = []
            for i, pid in enumerate(ids):
                payload = dict(metas[i] or {})
                if docs[i] is not None:
                    payload.setdefault("document", docs[i])
                page.append({"id": pid, "vector": embs[i],
                             "payload": payload})
            yield page
            if len(ids) < self.page_size:
                return
            offset += len(ids)


class ElasticsearchScrollSource:
    """search_after pagination over an Elasticsearch index
    (connectors/elasticsearch.rs: POST /{index}/_search sorted by _id asc,
    search_after cursor; dense_vector field + payload from _source)."""

    def __init__(self, url: str, index: str, vector_field: str = "vector",
                 api_key: Optional[str] = None, page_size: int = 500,
                 transport: Transport = urllib_transport,
                 retry: RetryConfig = RetryConfig(),
                 sleep: Callable[[float], None] = time.sleep):
        self.base = url.rstrip("/")
        self.index = index
        self.vector_field = vector_field
        self.api_key = api_key
        self.page_size = page_size
        self.transport = transport
        self.retry = retry
        self.sleep = sleep

    def _headers(self) -> dict:
        return ({"Authorization": f"ApiKey {self.api_key}"}
                if self.api_key else {})

    def pages(self, search_after=None) -> Iterator[list[dict]]:
        url = f"{self.base}/{self.index}/_search"
        while True:
            body = {"size": self.page_size, "sort": [{"_id": "asc"}],
                    "query": {"match_all": {}}}
            if search_after is not None:
                body["search_after"] = search_after
            resp = with_retry(
                lambda: self.transport("POST", url, self._headers(), body),
                self.retry, self.sleep)
            hits = (resp.get("hits") or {}).get("hits") or []
            if not hits:
                return
            page = []
            for h in hits:
                src = dict(h.get("_source") or {})
                vec = src.pop(self.vector_field, None)
                page.append({"id": h["_id"], "vector": vec, "payload": src})
            yield page
            search_after = hits[-1].get("sort")
            if search_after is None:
                return


class MilvusScrollSource:
    """Offset pagination over a Milvus collection (connectors/milvus.rs:
    POST /v2/vectordb/entities/query with collectionName/limit/offset)."""

    def __init__(self, url: str, collection: str, vector_field: str = "vector",
                 api_key: Optional[str] = None, page_size: int = 500,
                 transport: Transport = urllib_transport,
                 retry: RetryConfig = RetryConfig(),
                 sleep: Callable[[float], None] = time.sleep):
        self.base = url.rstrip("/")
        self.collection = collection
        self.vector_field = vector_field
        self.api_key = api_key
        self.page_size = page_size
        self.transport = transport
        self.retry = retry
        self.sleep = sleep

    def _headers(self) -> dict:
        return ({"Authorization": f"Bearer {self.api_key}"}
                if self.api_key else {})

    def pages(self, offset: int = 0) -> Iterator[list[dict]]:
        url = f"{self.base}/v2/vectordb/entities/query"
        while True:
            body = {"collectionName": self.collection,
                    "outputFields": ["*"],
                    "limit": self.page_size, "offset": offset}
            resp = with_retry(
                lambda: self.transport("POST", url, self._headers(), body),
                self.retry, self.sleep)
            rows = resp.get("data") or []
            if not rows:
                return
            page = []
            for r in rows:
                r = dict(r)
                pid = r.pop("id", None)
                vec = r.pop(self.vector_field, None)
                page.append({"id": pid, "vector": vec, "payload": r})
            yield page
            if len(rows) < self.page_size:
                return
            offset += len(rows)


class WeaviateScrollSource:
    """Cursor pagination over a Weaviate class (connectors/weaviate.rs:
    POST /v1/graphql `Get { Class(limit, after) { props _additional
    { id vector } } }`; after-cursor = last object's id)."""

    def __init__(self, url: str, class_name: str,
                 properties: Sequence[str] = (),
                 api_key: Optional[str] = None, page_size: int = 200,
                 transport: Transport = urllib_transport,
                 retry: RetryConfig = RetryConfig(),
                 sleep: Callable[[float], None] = time.sleep):
        self.base = url.rstrip("/")
        self.class_name = class_name
        self.properties = list(properties)
        self.api_key = api_key
        self.page_size = page_size
        self.transport = transport
        self.retry = retry
        self.sleep = sleep

    def _headers(self) -> dict:
        return ({"Authorization": f"Bearer {self.api_key}"}
                if self.api_key else {})

    def pages(self, after: Optional[str] = None) -> Iterator[list[dict]]:
        url = f"{self.base}/v1/graphql"
        props = " ".join(self.properties)
        while True:
            after_clause = f', after: "{after}"' if after else ""
            gql = (f"{{ Get {{ {self.class_name}(limit: {self.page_size}"
                   f"{after_clause}) {{ {props} _additional {{ id vector "
                   f"}} }} }} }}")
            resp = with_retry(
                lambda: self.transport("POST", url, self._headers(),
                                       {"query": gql}),
                self.retry, self.sleep)
            objs = ((resp.get("data") or {}).get("Get") or {}) \
                .get(self.class_name) or []
            if not objs:
                return
            page = []
            for o in objs:
                o = dict(o)
                add = o.pop("_additional", {}) or {}
                page.append({"id": add.get("id"),
                             "vector": add.get("vector"), "payload": o})
            yield page
            after = (objs[-1].get("_additional") or {}).get("id")
            if after is None or len(objs) < self.page_size:
                return


class MongoDBScrollSource:
    """Skip/limit pagination over MongoDB Atlas via the Data API
    (connectors/mongodb.rs: POST {url}/action/find with camelCase body
    {dataSource, database, collection, filter?, skip, limit}, api-key
    header; mongodb_tests.rs pins the request shapes and the
    parse/extract rules mirrored here)."""

    def __init__(self, data_api_url: str, api_key: str, database: str,
                 collection: str, vector_field: str = "embedding",
                 id_field: str = "_id",
                 payload_fields: Sequence[str] = (),
                 filter: Optional[dict] = None,
                 data_source: str = "mongodb-atlas", page_size: int = 500,
                 transport: Transport = urllib_transport,
                 retry: RetryConfig = RetryConfig(),
                 sleep: Callable[[float], None] = time.sleep):
        self.base = data_api_url.rstrip("/")
        self.api_key = api_key
        self.database = database
        self.collection = collection
        self.vector_field = vector_field
        self.id_field = id_field
        self.payload_fields = list(payload_fields)
        self.filter = filter
        self.data_source = data_source
        self.page_size = page_size
        self.transport = transport
        self.retry = retry
        self.sleep = sleep

    def _headers(self) -> dict:
        return {"api-key": self.api_key}

    def _build_url(self, action: str) -> str:
        """mongodb.rs:110-115: {data_api_url}/action/{action}."""
        return f"{self.base}/action/{action}"

    def _parse_vector(self, doc: dict) -> list[float]:
        """mongodb.rs:180-202: missing field / non-array / non-numeric
        elements are extraction errors, never silent skips."""
        if self.vector_field not in doc:
            raise ValueError(
                f"Vector field '{self.vector_field}' not found in document")
        v = doc[self.vector_field]
        if not isinstance(v, list):
            raise ValueError(
                f"Vector field '{self.vector_field}' is not an array")
        try:
            return [float(x) for x in v]
        except (TypeError, ValueError):
            raise ValueError("Vector element is not a number") from None

    def _extract_id(self, doc: dict) -> str:
        """mongodb.rs:205-219: strings verbatim; ObjectId {"$oid": ...}
        unwraps; anything else stringifies; missing -> 'unknown'."""
        v = doc.get(self.id_field)
        if v is None:
            return "unknown"
        if isinstance(v, str):
            return v
        if isinstance(v, dict) and isinstance(v.get("$oid"), str):
            return v["$oid"]
        return json.dumps(v) if isinstance(v, (dict, list)) else str(v)

    def _extract_payload(self, doc: dict) -> dict:
        """mongodb.rs:222-243: id and vector fields skipped; a non-empty
        payload_fields list whitelists."""
        return {k: v for k, v in doc.items()
                if k not in (self.id_field, self.vector_field)
                and (not self.payload_fields or k in self.payload_fields)}

    def pages(self, skip: int = 0) -> Iterator[list[dict]]:
        """Yield find() pages of {"id", "vector", "payload"} dicts; pass
        a stored ``skip`` to resume."""
        url = self._build_url("find")
        while True:
            body = {"dataSource": self.data_source,
                    "database": self.database,
                    "collection": self.collection,
                    "skip": skip, "limit": self.page_size}
            if self.filter is not None:
                body["filter"] = self.filter
            resp = with_retry(
                lambda: self.transport("POST", url, self._headers(), body),
                self.retry, self.sleep)
            docs = resp.get("documents", [])
            if not docs:
                return
            yield [{"id": self._extract_id(d),
                    "vector": self._parse_vector(d),
                    "payload": self._extract_payload(d)} for d in docs]
            if len(docs) < self.page_size:
                return
            skip += len(docs)

    def count(self) -> int:
        """mongodb.rs get_count: aggregate [{$count: "total"}]."""
        body = {"dataSource": self.data_source, "database": self.database,
                "collection": self.collection,
                "pipeline": [{"$count": "total"}]}
        resp = with_retry(
            lambda: self.transport("POST", self._build_url("aggregate"),
                                   self._headers(), body),
            self.retry, self.sleep)
        docs = resp.get("documents", [])
        return int(docs[0]["total"]) if docs else 0


class RedisScrollSource:
    """Offset pagination over a Redis Stack RediSearch index via the
    REST command endpoint (connectors/redis.rs: POST {api}/{command}
    with {"args": [...]}; redis:// maps to http://, rediss:// to
    https://; Bearer auth from the password; redis_tests.rs pins the
    URL/vector/id/payload rules mirrored here)."""

    def __init__(self, url: str, index: str, password: Optional[str] = None,
                 vector_field: str = "embedding", key_prefix: str = "doc:",
                 payload_fields: Sequence[str] = (),
                 filter: Optional[str] = None, page_size: int = 500,
                 transport: Transport = urllib_transport,
                 retry: RetryConfig = RetryConfig(),
                 sleep: Callable[[float], None] = time.sleep):
        self.api_url = self._build_api_url(url)
        self.index = index
        self.password = password
        self.vector_field = vector_field
        self.key_prefix = key_prefix
        self.payload_fields = list(payload_fields)
        self.filter = filter
        self.page_size = page_size
        self.transport = transport
        self.retry = retry
        self.sleep = sleep

    @staticmethod
    def _build_api_url(redis_url: str) -> str:
        """redis.rs:99-105: redis:// -> http://, rediss:// -> https://,
        trailing slash stripped."""
        return (redis_url.replace("redis://", "http://")
                .replace("rediss://", "https://").rstrip("/"))

    def _headers(self) -> dict:
        return ({"Authorization": f"Bearer {self.password}"}
                if self.password else {})

    def _command(self, command: str, args: list) -> dict:
        return with_retry(
            lambda: self.transport("POST", f"{self.api_url}/{command}",
                                   self._headers(),
                                   {"args": [str(a) for a in args]}),
            self.retry, self.sleep)

    def _parse_vector(self, attrs: dict) -> list[float]:
        """redis.rs:173-207: JSON array OR a comma/space-separated
        string; missing field / bad elements are extraction errors."""
        if self.vector_field not in attrs:
            raise ValueError(
                f"Vector field '{self.vector_field}' not found in document")
        v = attrs[self.vector_field]
        if isinstance(v, list):
            try:
                return [float(x) for x in v]
            except (TypeError, ValueError):
                raise ValueError("Vector element is not a number") from None
        if isinstance(v, str):
            parts = [p for p in v.replace(",", " ").split() if p]
            try:
                return [float(p) for p in parts]
            except ValueError:
                raise ValueError("Invalid vector element") from None
        raise ValueError(
            f"Vector field '{self.vector_field}' has unsupported format")

    def _extract_id(self, key: str) -> str:
        """redis.rs:210-215: strip the configured key prefix when
        present."""
        return key[len(self.key_prefix):] \
            if key.startswith(self.key_prefix) else key

    def _extract_payload(self, attrs: dict) -> dict:
        return {k: v for k, v in attrs.items()
                if k != self.vector_field
                and (not self.payload_fields or k in self.payload_fields)}

    def info(self) -> dict:
        """FT.INFO {index} -> {num_docs, attributes}."""
        return self._command("FT.INFO", [self.index])

    def pages(self, offset: int = 0) -> Iterator[list[dict]]:
        """Yield FT.SEARCH pages of {"id", "vector", "payload"} dicts."""
        query = self.filter or "*"
        while True:
            args = [self.index, query, "LIMIT", offset, self.page_size,
                    "RETURN", 10]
            args.extend(self.payload_fields)
            resp = self._command("FT.SEARCH", args)
            results = resp.get("results", [])
            if not results:
                return
            yield [{"id": self._extract_id(r["id"]),
                    "vector": self._parse_vector(
                        r.get("extra_attributes", {}) or {}),
                    "payload": self._extract_payload(
                        r.get("extra_attributes", {}) or {})}
                   for r in results]
            if len(results) < self.page_size:
                return
            offset += len(results)


# ------------------------------------------------------------ landing

@dataclass
class MigrationStats:
    """pipeline.rs:13-37 — migrated counts + wall-clock throughput."""

    points_migrated: int = 0
    batches: int = 0
    elapsed_s: float = 0.0

    def throughput(self) -> float:
        return (self.points_migrated / self.elapsed_s
                if self.elapsed_s > 0 else 0.0)


class Transformer:
    """transform.rs:8-56 — field renames on the payload plus optional
    unit-normalization of the vector (the cosine-ready form); SQ8/binary
    quantization lives in functions/quantization.py and applies after
    landing (columnar, not per-point)."""

    def __init__(self, field_mappings: Optional[dict] = None,
                 normalize: bool = False):
        self.field_mappings = dict(field_mappings or {})
        self.normalize = normalize

    def transform_point(self, point: dict) -> dict:
        payload = {self.field_mappings.get(k, k): v
                   for k, v in (point.get("payload") or {}).items()}
        vec = point.get("vector")
        if self.normalize and vec:
            norm = sum(float(x) * float(x) for x in vec) ** 0.5
            if norm > 0:
                vec = [float(x) / norm for x in vec]
        return {**point, "vector": vec, "payload": payload}

    def transform_batch(self, page: list[dict]) -> list[dict]:
        return [self.transform_point(p) for p in page]


def _point_rows(page: list[dict]) -> list[dict]:
    """ExtractedPoint-shaped dicts (connectors/mod.rs:24-31 — string-typed
    id, vector, payload) → Collection rows. Non-numeric ids get a
    deterministic hash surrogate with the original kept in ``orig_id``."""
    rows = []
    for p in page:
        sid = str(p["id"])
        try:
            pid = int(sid)
        except ValueError:
            import hashlib

            pid = int.from_bytes(
                hashlib.sha1(sid.encode()).digest()[:8], "big") >> 1
        row = {"id": pid, "orig_id": sid,
               "vector": [float(x) for x in (p.get("vector") or [])]}
        row.update(p.get("payload") or {})
        rows.append(row)
    return rows


def migrate_scroll(spark: SparkSession, pages: Iterator[list[dict]],
                   name: str = "imported", metric: str = "cosine",
                   dimension: Optional[int] = None,
                   path: Optional[str] = None,
                   transformer: Optional[Transformer] = None,
                   stats: Optional[MigrationStats] = None):
    """Land any connector's page stream into a Collection, one upsert batch
    per page (durable path → one immutable log segment per page, so the
    migration is resumable and read-your-writes while running)."""
    from velesdb_spark.database import Collection

    t0 = time.monotonic()
    coll = Collection(spark, name, dimension, metric, path=path)
    for page in pages:
        if transformer is not None:
            page = transformer.transform_batch(page)
        rows = _point_rows(page)
        if rows:
            coll.upsert(rows)
            if stats is not None:
                stats.points_migrated += len(rows)
                stats.batches += 1
    if stats is not None:
        stats.elapsed_s = time.monotonic() - t0
    return coll


def migrate_qdrant(spark: SparkSession, source: QdrantScrollSource,
                   name: str = "imported", metric: str = "cosine",
                   dimension: Optional[int] = None, path: Optional[str] = None,
                   offset=None):
    """Stream a live Qdrant collection into a Collection, one upsert batch
    per scroll page (durable path → one log segment per page, resumable)."""
    return migrate_scroll(spark, source.pages(offset=offset), name, metric,
                          dimension, path)


def migrate_pinecone(spark: SparkSession, source: PineconeScrollSource,
                     name: str = "imported", metric: str = "cosine",
                     dimension: Optional[int] = None,
                     path: Optional[str] = None):
    """Stream a live Pinecone index into a Collection; non-numeric ids get
    a hash surrogate and keep the original in ``orig_id`` (same convention
    as sources/migrate.read_pinecone_export)."""
    pages = ([{"id": p["id"], "vector": p.get("values"),
               "payload": p.get("metadata")} for p in page]
             for page in source.pages())
    return migrate_scroll(spark, pages, name, metric, dimension, path)


def migrate_mongodb(spark: SparkSession, source: MongoDBScrollSource,
                    name: str = "imported", metric: str = "cosine",
                    dimension: Optional[int] = None,
                    path: Optional[str] = None, skip: int = 0):
    """Stream a MongoDB Atlas collection into a Collection, one upsert
    batch per Data-API find() page (resume from a stored ``skip``)."""
    return migrate_scroll(spark, source.pages(skip=skip), name, metric,
                          dimension, path)


def migrate_redis(spark: SparkSession, source: RedisScrollSource,
                  name: str = "imported", metric: str = "cosine",
                  dimension: Optional[int] = None,
                  path: Optional[str] = None, offset: int = 0):
    """Stream a RediSearch index into a Collection, one upsert batch per
    FT.SEARCH page (resume from a stored ``offset``)."""
    return migrate_scroll(spark, source.pages(offset=offset), name, metric,
                          dimension, path)

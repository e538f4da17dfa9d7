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
from typing import Callable, Iterator, Optional

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
        while True:
            url = (f"{self.base}/vectors/list?limit={self.page_size}"
                   + (f"&namespace={self.namespace}" if self.namespace else "")
                   + (f"&paginationToken={token}" if token else ""))
            listing = with_retry(
                lambda: self.transport("GET", url, self._headers(), None),
                self.retry, self.sleep)
            ids = [v["id"] for v in listing.get("vectors", [])]
            if ids:
                fetch_url = (f"{self.base}/vectors/fetch?"
                             + "&".join(f"ids={i}" for i in ids)
                             + (f"&namespace={self.namespace}"
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


# ------------------------------------------------------------ landing

def migrate_qdrant(spark: SparkSession, source: QdrantScrollSource,
                   name: str = "imported", metric: str = "cosine",
                   dimension: Optional[int] = None, path: Optional[str] = None,
                   offset=None):
    """Stream a live Qdrant collection into a Collection, one upsert batch
    per scroll page (durable path → one log segment per page, resumable)."""
    from velesdb_spark.database import Collection

    coll = Collection(spark, name, dimension, metric, path=path)
    for page in source.pages(offset=offset):
        rows = []
        for p in page:
            row = {"id": int(p["id"]),
                   "vector": [float(x) for x in (p.get("vector") or [])]}
            row.update(p.get("payload") or {})
            rows.append(row)
        coll.upsert(rows)
    return coll


def migrate_pinecone(spark: SparkSession, source: PineconeScrollSource,
                     name: str = "imported", metric: str = "cosine",
                     dimension: Optional[int] = None,
                     path: Optional[str] = None):
    """Stream a live Pinecone index into a Collection; non-numeric ids get
    a hash surrogate and keep the original in ``orig_id`` (same convention
    as sources/migrate.read_pinecone_export)."""
    from velesdb_spark.database import Collection

    coll = Collection(spark, name, dimension, metric, path=path)
    for page in source.pages():
        coll.upsert(_pinecone_rows(page))
    return coll


def _pinecone_rows(page: list[dict]) -> list[dict]:
    rows = []
    for p in page:
        sid = str(p["id"])
        try:
            pid = int(sid)
        except ValueError:
            # deterministic surrogate (documented lossy rename)
            import hashlib

            pid = int.from_bytes(
                hashlib.sha1(sid.encode()).digest()[:8], "big") >> 1
        row = {"id": pid, "orig_id": sid,
               "vector": [float(x) for x in (p.get("values") or [])]}
        row.update(p.get("metadata") or {})
        rows.append(row)
    return rows

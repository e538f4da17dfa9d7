"""Live-scroll migration clients (velesdb-migrate connectors/retry parity)
driven by a fake HTTP transport — pagination, auth headers, retry/backoff,
resume-from-offset, and landing into durable Collections."""

import random

import pytest

from velesdb_spark.sources import scroll as S


# ------------------------------------------------------------ retry


def test_retry_backoff_schedule():
    """Delays double from initial to cap (retry.rs defaults 0.5s ×2 → 30s);
    success on a later attempt returns the value, exhaustion reraises."""
    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise ConnectionError("transient")
        return {"ok": True}

    cfg = S.RetryConfig(max_retries=3, initial_delay_s=0.5,
                        max_delay_s=30.0, add_jitter=False)
    out = S.with_retry(flaky, cfg, sleep=sleeps.append)
    assert out == {"ok": True}
    assert sleeps == [0.5, 1.0, 2.0]

    with pytest.raises(ConnectionError):
        S.with_retry(lambda: (_ for _ in ()).throw(ConnectionError("down")),
                     S.RetryConfig(max_retries=2, add_jitter=False),
                     sleep=sleeps.append)


def test_retry_delay_cap_and_jitter():
    cfg = S.RetryConfig(max_retries=6, initial_delay_s=1.0, max_delay_s=8.0,
                        add_jitter=False)
    assert list(cfg.delays()) == [1.0, 2.0, 4.0, 8.0, 8.0, 8.0]
    jit = S.RetryConfig(max_retries=4, initial_delay_s=2.0, add_jitter=True)
    ds = list(jit.delays(rng=random.Random(7)))
    # jitter keeps each delay within 50-100% of the deterministic step
    for d, base in zip(ds, [2.0, 4.0, 8.0, 16.0]):
        assert base * 0.5 <= d <= base


# ------------------------------------------------------------ qdrant scroll


def _qdrant_fake(pages, fail_first=0):
    """Fake transport serving scroll pages; optionally fails the first N
    calls to exercise retry. Records every request."""
    log = []
    state = {"fails": fail_first}

    def transport(method, url, headers, body):
        log.append((method, url, dict(headers), body))
        if state["fails"] > 0:
            state["fails"] -= 1
            raise ConnectionError("boom")
        offset = (body or {}).get("offset", 0)
        pts = pages[offset] if offset < len(pages) else []
        nxt = offset + 1 if offset + 1 < len(pages) else None
        return {"result": {"points": pts, "next_page_offset": nxt}}

    transport.log = log
    return transport


def _qpoint(i):
    return {"id": i, "vector": [float(i), 0.0, 1.0],
            "payload": {"tag": f"t{i % 2}"}}


def test_qdrant_scroll_pagination_and_auth():
    pages = [[_qpoint(0), _qpoint(1)], [_qpoint(2)], [_qpoint(3)]]
    t = _qdrant_fake(pages)
    src = S.QdrantScrollSource("http://qd:6333/", "docs", api_key="sekret",
                               page_size=2, transport=t)
    got = list(src.pages())
    assert [len(p) for p in got] == [2, 1, 1]
    assert [p["id"] for page in got for p in page] == [0, 1, 2, 3]
    method, url, headers, body = t.log[0]
    assert method == "POST"
    assert url == "http://qd:6333/collections/docs/points/scroll"
    assert headers["api-key"] == "sekret"
    assert body["limit"] == 2 and body["with_vector"] is True
    # resume from a stored offset skips earlier pages
    resumed = list(src.pages(offset=2))
    assert [p["id"] for page in resumed for p in page] == [3]


def test_qdrant_scroll_retries_transient_errors():
    pages = [[_qpoint(0)], [_qpoint(1)]]
    t = _qdrant_fake(pages, fail_first=2)
    sleeps = []
    src = S.QdrantScrollSource(
        "http://qd", "c", transport=t,
        retry=S.RetryConfig(max_retries=3, initial_delay_s=0.1,
                            add_jitter=False),
        sleep=sleeps.append)
    got = [p["id"] for page in src.pages() for p in page]
    assert got == [0, 1]
    assert sleeps == [0.1, 0.2]  # two transient failures, backed off


def test_migrate_qdrant_lands_durable_and_resumable(spark, tmp_path):
    pages = [[_qpoint(0), _qpoint(1)], [_qpoint(2)]]
    src = S.QdrantScrollSource("http://qd", "c", page_size=2,
                               transport=_qdrant_fake(pages))
    coll = S.migrate_qdrant(spark, src, "m", path=str(tmp_path / "m"))
    rows = {r.id: r for r in coll.df.collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[2].tag == "t0" and rows[1].vector == [1.0, 0.0, 1.0]
    # one immutable log segment per page → resumable migration
    from velesdb_spark.storage import read_manifest
    m = read_manifest(str(tmp_path / "m" / "points_log"))
    assert len(m["segments"]) == 2


# ------------------------------------------------------------ pinecone


def test_pinecone_list_fetch_pagination(spark):
    listing_pages = [
        {"vectors": [{"id": "a"}, {"id": "7"}],
         "pagination": {"next": "tok1"}},
        {"vectors": [{"id": "b"}]},
    ]
    store = {
        "a": {"values": [1.0, 2.0], "metadata": {"lang": "en"}},
        "7": {"values": [3.0, 4.0], "metadata": {"lang": "fr"}},
        "b": {"values": [5.0, 6.0], "metadata": None},
    }
    calls = {"n": 0}

    def transport(method, url, headers, body):
        assert headers.get("Api-Key") == "pk"
        if "/vectors/list" in url:
            page = listing_pages[0] if "paginationToken" not in url \
                else listing_pages[1]
            calls["n"] += 1
            return page
        ids = [kv.split("=")[1] for kv in url.split("?")[1].split("&")
               if kv.startswith("ids=")]
        return {"vectors": {i: store[i] for i in ids}}

    src = S.PineconeScrollSource("http://pc", api_key="pk", page_size=2,
                                 transport=transport)
    coll = S.migrate_pinecone(spark, src, "p")
    rows = {r.orig_id: r for r in coll.df.collect()}
    assert set(rows) == {"a", "7", "b"}
    assert rows["7"].id == 7                  # numeric id preserved
    assert rows["a"].id != 7 and rows["a"].id > 0   # hash surrogate
    assert rows["a"].lang == "en"
    assert rows["b"].vector == [5.0, 6.0]


def test_pinecone_urls_percent_encoded():
    """ids/namespace/pagination tokens with '&', '#', '+', spaces must be
    percent-encoded — raw interpolation would truncate the query string or
    fetch the wrong vectors."""
    from urllib.parse import parse_qs, urlsplit

    raw_id = "a&b #c+d"
    listing_pages = [
        {"vectors": [{"id": raw_id}], "pagination": {"next": "t&k="}},
        {"vectors": []},
    ]
    seen = []

    def transport(method, url, headers, body):
        seen.append(url)
        assert "#" not in url and " " not in url
        if "/vectors/list" in url:
            return listing_pages[0] if "paginationToken" not in url \
                else listing_pages[1]
        qs = parse_qs(urlsplit(url).query)
        assert qs["ids"] == [raw_id]          # round-trips exactly
        assert qs["namespace"] == ["n s&1"]
        return {"vectors": {raw_id: {"values": [1.0], "metadata": None}}}

    src = S.PineconeScrollSource("http://pc", namespace="n s&1",
                                 page_size=2, transport=transport)
    pages = list(src.pages())
    assert [len(p) for p in pages] == [1]
    list_urls = [u for u in seen if "/vectors/list" in u]
    tok = parse_qs(urlsplit(list_urls[1]).query)["paginationToken"]
    assert tok == ["t&k="]                    # token round-trips too


# ------------------------------------------------------------ chromadb


def test_chromadb_offset_pagination(spark):
    data = {i: ([float(i), 1.0], {"tag": f"t{i}"}, f"doc {i}")
            for i in range(5)}

    def transport(method, url, headers, body):
        assert url.endswith("/api/v1/collections/c/get")
        ids = sorted(data)[body["offset"]:body["offset"] + body["limit"]]
        return {"ids": [str(i) for i in ids],
                "embeddings": [data[i][0] for i in ids],
                "metadatas": [data[i][1] for i in ids],
                "documents": [data[i][2] for i in ids]}

    src = S.ChromaDBScrollSource("http://ch", "c", page_size=2,
                                 transport=transport)
    pages = list(src.pages())
    assert [len(p) for p in pages] == [2, 2, 1]
    coll = S.migrate_scroll(spark, iter(pages), "ch")
    rows = {r.id: r for r in coll.df.collect()}
    assert set(rows) == set(range(5))
    assert rows[3].tag == "t3" and rows[3].document == "doc 3"
    assert rows[2].vector == [2.0, 1.0]


# ------------------------------------------------------------ elasticsearch


def test_elasticsearch_search_after_pagination(spark):
    docs = {f"d{i}": {"vector": [float(i)], "lang": "en"} for i in range(4)}

    def transport(method, url, headers, body):
        assert url.endswith("/idx/_search")
        assert headers.get("Authorization") == "ApiKey ek"
        assert body["sort"] == [{"_id": "asc"}]
        ids = sorted(docs)
        if "search_after" in body:
            ids = [i for i in ids if i > body["search_after"][0]]
        ids = ids[:body["size"]]
        return {"hits": {"hits": [
            {"_id": i, "_source": dict(docs[i]), "sort": [i]} for i in ids]}}

    src = S.ElasticsearchScrollSource("http://es", "idx", api_key="ek",
                                      page_size=3, transport=transport)
    pages = list(src.pages())
    assert [len(p) for p in pages] == [3, 1]
    coll = S.migrate_scroll(spark, iter(pages), "es")
    rows = {r.orig_id: r for r in coll.df.collect()}
    assert set(rows) == {"d0", "d1", "d2", "d3"}
    assert rows["d2"].vector == [2.0] and rows["d2"].lang == "en"
    # the vector field is stripped out of the payload
    assert "vector" not in (set(rows["d2"].asDict()) - {"vector"} or True)


# ------------------------------------------------------------ milvus


def test_milvus_offset_pagination(spark):
    rows_src = [{"id": i, "vector": [float(i)], "part": i % 2}
                for i in range(5)]

    def transport(method, url, headers, body):
        assert url.endswith("/v2/vectordb/entities/query")
        assert headers.get("Authorization") == "Bearer mk"
        assert body["collectionName"] == "c"
        sl = rows_src[body["offset"]:body["offset"] + body["limit"]]
        return {"data": [dict(r) for r in sl]}

    src = S.MilvusScrollSource("http://mv", "c", api_key="mk", page_size=2,
                               transport=transport)
    coll = S.migrate_scroll(spark, src.pages(), "mv")
    rows = {r.id: r for r in coll.df.collect()}
    assert set(rows) == set(range(5))
    assert rows[4].part == 0 and rows[3].vector == [3.0]


# ------------------------------------------------------------ weaviate


def test_weaviate_cursor_pagination(spark):
    objs = [{"title": f"t{i}",
             "_additional": {"id": f"uuid-{i}", "vector": [float(i)]}}
            for i in range(5)]

    def transport(method, url, headers, body):
        assert url.endswith("/v1/graphql")
        gql = body["query"]
        assert "Get { Doc(limit: 2" in gql and "title _additional" in gql
        start = 0
        if "after:" in gql:
            cur = gql.split('after: "')[1].split('"')[0]
            start = next(i for i, o in enumerate(objs)
                         if o["_additional"]["id"] == cur) + 1
        return {"data": {"Get": {
            "Doc": [dict(o) for o in objs[start:start + 2]]}}}

    src = S.WeaviateScrollSource("http://wv", "Doc", properties=["title"],
                                 page_size=2, transport=transport)
    pages = list(src.pages())
    assert [len(p) for p in pages] == [2, 2, 1]
    coll = S.migrate_scroll(spark, iter(pages), "wv")
    rows = {r.orig_id: r for r in coll.df.collect()}
    assert set(rows) == {f"uuid-{i}" for i in range(5)}
    assert rows["uuid-1"].title == "t1" and rows["uuid-1"].vector == [1.0]


# ------------------------------------------------------------ transform/stats


def test_transformer_and_stats(spark):
    import math

    pages = [[{"id": 1, "vector": [3.0, 4.0], "payload": {"txt": "a"}}],
             [{"id": 2, "vector": [0.0, 0.0], "payload": {"txt": "b"}}]]
    tr = S.Transformer(field_mappings={"txt": "text"}, normalize=True)
    st = S.MigrationStats()
    coll = S.migrate_scroll(spark, iter(pages), "t", transformer=tr,
                            stats=st)
    rows = {r.id: r for r in coll.df.collect()}
    assert rows[1].text == "a" and "txt" not in rows[1].asDict()
    assert math.isclose(rows[1].vector[0], 0.6)
    assert math.isclose(rows[1].vector[1], 0.8)
    assert rows[2].vector == [0.0, 0.0]     # zero vector left untouched
    assert st.points_migrated == 2 and st.batches == 2
    assert st.elapsed_s > 0 and st.throughput() > 0


def test_csv_connector_behaviors(spark, tmp_path):
    """CsvFileConnector parity (reference csv_file_tests.rs): JSON-array
    vector column, spread dim_* columns, tab delimiter, headerless col_N
    naming, missing-column error."""
    import math

    import pytest

    from velesdb_spark.sources.migrate import read_csv_vectors

    p1 = tmp_path / "v.csv"
    p1.write_text('id,vector,title\n1,"[0.1, 0.2, 0.3]",Doc 1\n'
                  '2,"[0.4, 0.5, 0.6]",Doc 2\n')
    c = read_csv_vectors(spark, str(p1), name="csv_json")
    rows = {r.id: r for r in c.df.collect()}
    assert math.isclose(rows[1].vector[0], 0.1, rel_tol=1e-6)
    assert rows[1].title == "Doc 1" and len(rows) == 2

    p2 = tmp_path / "s.csv"
    p2.write_text("id,dim_0,dim_1,dim_2,title\na,0.1,0.2,0.3,T\n"
                  "b,0.4,0.5,0.6,T2\n")
    c2 = read_csv_vectors(spark, str(p2), name="csv_spread",
                          vector_spread=True)
    got = sorted((len(r.vector) for r in c2.df.collect()))
    assert got == [3, 3]

    p3 = tmp_path / "t.tsv"
    p3.write_text('id\tvector\ttitle\n1\t"[1.0, 2.0]"\tDoc\n')
    c3 = read_csv_vectors(spark, str(p3), name="csv_tab", delimiter="\t")
    r3 = c3.df.collect()[0]
    assert r3.vector == [1.0, 2.0]

    p4 = tmp_path / "nh.csv"
    p4.write_text('1,"[0.1,0.2]",test\n2,"[0.3,0.4]",test2\n')
    c4 = read_csv_vectors(spark, str(p4), name="csv_nohdr",
                          id_column="col_0", vector_column="col_1",
                          has_header=False)
    assert sorted(r.id for r in c4.df.collect()) == [1, 2]

    p5 = tmp_path / "m.csv"
    p5.write_text("id,title\n1,Test\n")
    with pytest.raises(ValueError, match="vector column"):
        read_csv_vectors(spark, str(p5), name="csv_missing")


def test_json_connector_behaviors(spark, tmp_path):
    """JsonFileConnector parity (reference json_file_tests.rs): root
    array, dotted array_path, row_N auto ids, payload selection,
    invalid-JSON error."""
    import pytest

    from velesdb_spark.sources.migrate import read_json_vectors

    p1 = tmp_path / "v.json"
    p1.write_text('[{"id": "1", "vector": [0.1, 0.2, 0.3], "title": "D1"},'
                  ' {"id": "2", "vector": [0.4, 0.5, 0.6], "title": "D2"}]')
    c = read_json_vectors(spark, str(p1), name="json_root")
    rows = {r.orig_id: r for r in c.df.collect()}
    assert rows["1"].id == 1 and len(rows["1"].vector) == 3
    assert '"title": "D1"' in rows["1"].payload

    p2 = tmp_path / "n.json"
    p2.write_text('{"data": {"vectors": [{"id": "a", "vector": [1.0, 2.0]}]}}')
    c2 = read_json_vectors(spark, str(p2), name="json_nested",
                           array_path="data.vectors")
    r2 = c2.df.collect()[0]
    assert r2.orig_id == "a" and r2.id > 0   # hashed surrogate

    p3 = tmp_path / "a.json"
    p3.write_text('[{"vector": [0.1, 0.2]}, {"vector": [0.3, 0.4]}]')
    c3 = read_json_vectors(spark, str(p3), name="json_auto")
    assert sorted(r.orig_id for r in c3.df.collect()) == \
        ["row_0", "row_1"]

    p4 = tmp_path / "bad.json"
    p4.write_text("not valid json")
    with pytest.raises(Exception):
        read_json_vectors(spark, str(p4), name="json_bad")
    p5 = tmp_path / "np.json"
    p5.write_text('{"data": {}}')
    with pytest.raises(ValueError, match="array_path"):
        read_json_vectors(spark, str(p5), name="json_nopath",
                          array_path="data.vectors")


# ------------------------------------------------------------ mongodb


class _MongoFake:
    """Atlas Data API fake: find pages by skip/limit; aggregate counts."""

    def __init__(self, docs):
        self.docs = docs
        self.log = []

    def __call__(self, method, url, headers, body):
        self.log.append((method, url, headers, body))
        if url.endswith("/action/aggregate"):
            return {"documents": [{"total": len(self.docs)}]}
        assert url.endswith("/action/find")
        skip, limit = body["skip"], body["limit"]
        return {"documents": self.docs[skip:skip + limit]}


def _mdoc(i, **extra):
    return {"_id": {"$oid": f"oid{i:04d}"}, "embedding": [float(i), 0.5],
            "title": f"t{i}", **extra}


def test_mongodb_find_pagination_and_request_shape(spark):
    """mongodb_tests.rs: camelCase find body (dataSource/database/
    collection/skip/limit), api-key header, {url}/action/{action} URL;
    ObjectId ids unwrap; payload skips _id + vector; count() via the
    $count aggregate."""
    docs = [_mdoc(i) for i in range(5)]
    t = _MongoFake(docs)
    src = S.MongoDBScrollSource(
        "https://data.mongodb-api.com/app/x/endpoint/data/v1/", "key1",
        "mydb", "vectors", page_size=2, transport=t)
    got = list(src.pages())
    assert [len(p) for p in got] == [2, 2, 1]
    flat = [p for page in got for p in page]
    assert flat[0]["id"] == "oid0000"
    assert flat[0]["vector"] == [0.0, 0.5]
    assert flat[0]["payload"] == {"title": "t0"}
    method, url, headers, body = t.log[0]
    assert method == "POST"
    assert url == ("https://data.mongodb-api.com/app/x/endpoint/data/v1"
                   "/action/find")
    assert headers["api-key"] == "key1"
    assert body["dataSource"] == "mongodb-atlas"
    assert body["database"] == "mydb" and body["collection"] == "vectors"
    assert src.count() == 5
    # resume from a stored skip
    assert [p["id"] for page in src.pages(skip=4) for p in page] \
        == ["oid0004"]


def test_mongodb_parse_and_extract_rules():
    """mongodb_tests.rs parse_vector/extract_id/extract_payload rules:
    missing/non-array vectors error; string ids verbatim, $oid unwraps,
    missing id -> 'unknown'; payload_fields whitelists; a filter rides
    the find body."""
    src = S.MongoDBScrollSource("http://m", "k", "db", "c",
                                payload_fields=["title"],
                                filter={"kind": "doc"},
                                transport=lambda *a: {"documents": []})
    with pytest.raises(ValueError, match="not found"):
        src._parse_vector({"title": "x"})
    with pytest.raises(ValueError, match="not an array"):
        src._parse_vector({"embedding": "nope"})
    with pytest.raises(ValueError, match="not a number"):
        src._parse_vector({"embedding": [1.0, "x"]})
    assert src._extract_id({"_id": "plain"}) == "plain"
    assert src._extract_id({"_id": {"$oid": "abc"}}) == "abc"
    assert src._extract_id({}) == "unknown"
    assert src._extract_payload(
        {"_id": 1, "embedding": [1.0], "title": "t", "junk": "x"}) \
        == {"title": "t"}
    # filter is serialized into the find request
    t = _MongoFake([])
    src2 = S.MongoDBScrollSource("http://m", "k", "db", "c",
                                 filter={"kind": "doc"}, transport=t)
    list(src2.pages())
    assert t.log[0][3]["filter"] == {"kind": "doc"}


# ------------------------------------------------------------ redis


class _RedisFake:
    """REST command-endpoint fake: FT.SEARCH pages by LIMIT off/num."""

    def __init__(self, results):
        self.results = results
        self.log = []

    def __call__(self, method, url, headers, body):
        self.log.append((method, url, headers, body))
        if url.endswith("/FT.INFO"):
            return {"num_docs": len(self.results), "attributes": []}
        assert url.endswith("/FT.SEARCH")
        args = body["args"]
        off, num = int(args[3]), int(args[4])
        return {"results": self.results[off:off + num],
                "total": len(self.results)}


def test_redis_search_pagination_and_url_mapping(spark):
    """redis_tests.rs: redis:// -> http:// (rediss:// -> https://), Bearer
    auth from the password, FT.SEARCH args [index, query, LIMIT, off,
    num, RETURN, 10], key-prefix stripping, payload skips the vector."""
    results = [{"id": f"doc:{i}",
                "extra_attributes": {"embedding": [float(i), 1.0],
                                     "title": f"t{i}"}} for i in range(3)]
    t = _RedisFake(results)
    src = S.RedisScrollSource("redis://r:6379/", "idx", password="pw",
                              page_size=2, transport=t)
    assert src.api_url == "http://r:6379"
    assert S.RedisScrollSource._build_api_url("rediss://r/") == "https://r"
    got = [p for page in src.pages() for p in page]
    assert [p["id"] for p in got] == ["0", "1", "2"]
    assert got[0]["vector"] == [0.0, 1.0]
    assert got[0]["payload"] == {"title": "t0"}
    method, url, headers, body = t.log[0]
    assert url == "http://r:6379/FT.SEARCH"
    assert headers["Authorization"] == "Bearer pw"
    assert body["args"][:2] == ["idx", "*"]
    assert body["args"][2:5] == ["LIMIT", "0", "2"]
    assert src.info()["num_docs"] == 3
    # a filter replaces the match-all query
    src_f = S.RedisScrollSource("redis://r", "idx", filter="@kind:{doc}",
                                transport=_RedisFake(results))
    list(src_f.pages())


def test_redis_vector_and_id_rules():
    """redis_tests.rs parse_vector (array OR comma/space string),
    extract_id prefix handling, extract_payload filtering."""
    src = S.RedisScrollSource("redis://r", "idx",
                              transport=lambda *a: {"results": []})
    assert src._parse_vector({"embedding": [1, 2]}) == [1.0, 2.0]
    assert src._parse_vector({"embedding": "1.5, 2.5"}) == [1.5, 2.5]
    assert src._parse_vector({"embedding": "1.5 2.5"}) == [1.5, 2.5]
    with pytest.raises(ValueError, match="not found"):
        src._parse_vector({})
    with pytest.raises(ValueError, match="Invalid vector"):
        src._parse_vector({"embedding": "a b"})
    with pytest.raises(ValueError, match="unsupported"):
        src._parse_vector({"embedding": 7})
    assert src._extract_id("doc:42") == "42"
    assert src._extract_id("other:42") == "other:42"
    pf = S.RedisScrollSource("redis://r", "idx", payload_fields=["a"],
                             transport=lambda *a: {"results": []})
    assert pf._extract_payload({"embedding": [1], "a": 1, "b": 2}) == {"a": 1}


def test_migrate_mongodb_and_redis_land(spark):
    """Both new connectors land through migrate_scroll with the standard
    id-surrogate convention."""
    mdocs = [_mdoc(i) for i in range(3)]
    mcoll = S.migrate_mongodb(
        spark, S.MongoDBScrollSource("http://m", "k", "db", "c",
                                     page_size=2,
                                     transport=_MongoFake(mdocs)),
        name="from_mongo", dimension=2)
    assert mcoll.count() == 3
    assert mcoll.df.filter("orig_id = 'oid0001'").count() == 1

    results = [{"id": f"doc:{i}",
                "extra_attributes": {"embedding": [float(i)]}}
               for i in range(4)]
    rcoll = S.migrate_redis(
        spark, S.RedisScrollSource("redis://r", "idx", page_size=3,
                                   transport=_RedisFake(results)),
        name="from_redis", dimension=1)
    assert rcoll.count() == 4
    assert {r.id for r in rcoll.df.select("id").collect()} == {0, 1, 2, 3}

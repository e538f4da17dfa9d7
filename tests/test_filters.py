"""Programmatic filter-dict surface (filter/mod.rs Condition JSON →
Column), matching filter/matching.rs null semantics exactly."""

import pytest
from pyspark.sql import functions as F

from velesdb_spark.functions.filters import FilterError, filter_to_column


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [(1, "tech", "rust is fast", 10.0),
         (2, "news", "python data pipelines", 5.0),
         (3, None, None, 7.5),
         (4, "tech", "spark data engine", None)],
        "id bigint, category string, text string, score double")


def _ids(df, cond):
    return sorted(r.id for r in df.filter(filter_to_column(cond)).collect())


def test_eq_neq_null_semantics(tdf):
    assert _ids(tdf, {"type": "eq", "field": "category", "value": "tech"}) == [1, 4]
    # Neq is TRUE on missing/null (matching.rs:14-16)
    assert _ids(tdf, {"type": "neq", "field": "category", "value": "tech"}) == [2, 3]
    # Eq against null matches null fields
    assert _ids(tdf, {"type": "eq", "field": "category", "value": None}) == [3]
    assert _ids(tdf, {"type": "neq", "field": "category", "value": None}) == [1, 2, 4]


def test_range_in_contains(tdf):
    assert _ids(tdf, {"type": "gt", "field": "score", "value": 6.0}) == [1, 3]
    assert _ids(tdf, {"type": "lte", "field": "score", "value": 7.5}) == [2, 3]
    assert _ids(tdf, {"type": "in", "field": "category",
                      "values": ["news", "blog"]}) == [2]
    # Contains: substring, false on null (matching.rs:31-32)
    assert _ids(tdf, {"type": "contains", "field": "text", "value": "data"}) == [2, 4]
    assert _ids(tdf, {"type": "contains", "field": "text", "value": "zzz"}) == []


def test_null_checks_and_boolean_composition(tdf):
    assert _ids(tdf, {"type": "is_null", "field": "text"}) == [3]
    assert _ids(tdf, {"type": "is_not_null", "field": "score"}) == [1, 2, 3]
    assert _ids(tdf, {"type": "and", "conditions": [
        {"type": "eq", "field": "category", "value": "tech"},
        {"type": "contains", "field": "text", "value": "data"}]}) == [4]
    assert _ids(tdf, {"type": "or", "conditions": [
        {"type": "eq", "field": "id", "value": 1},
        {"type": "is_null", "field": "category"}]}) == [1, 3]
    # NOT over a definite boolean: null text rows pass NOT contains
    assert _ids(tdf, {"type": "not", "condition":
                      {"type": "contains", "field": "text", "value": "data"}}) == [1, 3]


def test_like_ilike_and_wrapper(tdf):
    assert _ids(tdf, {"type": "like", "field": "text", "pattern": "%data%"}) == [2, 4]
    assert _ids(tdf, {"type": "ilike", "field": "category", "pattern": "TECH"}) == [1, 4]
    # full Filter wrapper {"condition": ...} (filter/mod.rs:33-40)
    assert _ids(tdf, {"condition": {"type": "eq", "field": "id", "value": 2}}) == [2]


def test_errors(tdf):
    with pytest.raises(FilterError):
        filter_to_column({"type": "frobnicate", "field": "x"})
    with pytest.raises(FilterError):
        filter_to_column({"field": "x"})
    with pytest.raises(FilterError):
        filter_to_column({"type": "and", "conditions": []})
    with pytest.raises(FilterError):
        filter_to_column("not a dict")


def test_search_with_filter_accepts_dict(spark):
    from velesdb_spark.database import Collection

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], "tech" if i % 2 else "news",
          f"doc {i} spark data") for i in range(1, 9)],
        "id bigint, vector array<float>, category string, text string")
    col = Collection(spark, "c", metric="cosine", df=df, text_col="text")
    res = col.search_with_filter(
        [1.0, 1.0], {"type": "eq", "field": "category", "value": "tech"}, k=3)
    ids = [r.id for r in res.collect()]
    assert len(ids) == 3 and all(i % 2 == 1 for i in ids)

    tres = col.text_search(
        "spark", k=3,
        filter_cond={"type": "eq", "field": "category", "value": "news"})
    trows = tres.collect()
    assert 0 < len(trows) <= 3
    assert all(r.category == "news" for r in trows)
    # exact filtered top-k: equals unfiltered scores restricted to the
    # filtered ids (no over-fetch loss)
    full = {r.id: r.score for r in col.text_search("spark", k=100).collect()}
    for r in trows:
        assert abs(full[r.id] - r.score) < 1e-9


def test_batch_search_per_query_filters(spark):
    """batch.rs:26-231 request-dict form with per-query filters; all
    queries run as one unioned plan."""
    from velesdb_spark.database import Collection

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], "tech" if i % 2 else "news")
         for i in range(1, 11)],
        "id bigint, vector array<float>, category string")
    col = Collection(spark, "c", metric="euclidean", df=df)
    out = col.batch_search(searches=[
        {"vector": [1.0, 1.0], "top_k": 2,
         "filter": {"type": "eq", "field": "category", "value": "tech"}},
        {"vector": [10.0, 1.0], "top_k": 2},
    ]).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r.id)
    assert all(i % 2 == 1 for i in by_q[0])
    assert len(by_q[0]) == 2 and len(by_q[1]) == 2
    assert 10 in by_q[1]  # closest to [10,1] unfiltered


def test_multi_query_and_hybrid_filtered(spark):
    from velesdb_spark.database import Collection

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], "tech" if i % 2 else "news",
          f"doc {i} spark data") for i in range(1, 11)],
        "id bigint, vector array<float>, category string, text string")
    col = Collection(spark, "c", metric="cosine", df=df, text_col="text")
    cond = {"type": "eq", "field": "category", "value": "tech"}
    mres = col.multi_query_search([[1.0, 1.0], [2.0, 1.0]], k=3,
                                  strategy="average", filter_cond=cond)
    assert all(r.id % 2 == 1 for r in mres.collect())
    hres = col.hybrid_search("spark", [1.0, 1.0], k=3, filter_cond=cond)
    rows = hres.collect()
    assert 0 < len(rows) <= 3 and all(r.id % 2 == 1 for r in rows)


def test_hybrid_vector_weight_convention(spark):
    """bindings' single-knob vector_weight (text.rs:133-134): weight
    clamped to [0,1], text weight = 1 - weight. vw=1 → pure vector
    ranking; vw=0 → pure text ranking."""
    from velesdb_spark.database import Collection

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], f"term{'s' * (i % 3)} spark doc {i}")
         for i in range(1, 9)],
        "id bigint, vector array<float>, text string")
    col = Collection(spark, "c", metric="euclidean", df=df, text_col="text")
    pure_v = [r.id for r in
              col.hybrid_search("spark", [1.0, 1.0], k=3,
                                vector_weight=5.0).collect()]  # clamps to 1
    vres = [r.id for r in col.search([1.0, 1.0], 3).collect()]
    assert pure_v == vres
    pure_t = [r.id for r in
              col.hybrid_search("spark", [1.0, 1.0], k=3,
                                vector_weight=0.0).collect()]
    tres = [r.id for r in col.text_search("spark", 3).collect()]
    assert pure_t == tres


def test_bindings_api_surface(spark):
    """collection.rs binding methods: info/is_empty/is_metadata_only/
    upsert_metadata/list_indexes/has_*_index/drop_index."""
    from velesdb_spark.database import Collection

    col = Collection(spark, "api", dimension=2, metric="cosine")
    assert col.is_empty() and col.is_metadata_only()
    col.upsert([{"id": 1, "vector": [1.0, 0.0], "tag": "a"}])
    assert not col.is_empty() and not col.is_metadata_only()
    inf = col.info()
    assert inf["name"] == "api" and inf["metric"] == "cosine" \
        and inf["dimension"] == 2 and inf["count"] == 1

    col.upsert_metadata([{"id": 2, "payload": {"tag": "b"}}])
    assert col.count() == 2
    assert col.get(2)["tag"] == "b" and col.get(2)["vector"] is None

    assert col.list_indexes() == []
    col.create_property_index("Doc", "tag")
    col.create_range_index("Doc", "price")
    assert col.has_property_index("Doc", "tag")
    assert col.has_range_index("Doc", "price")
    assert not col.has_property_index("Doc", "price")
    assert len(col.list_indexes()) == 2
    col.drop_index("Doc", "tag")
    assert not col.has_property_index("Doc", "tag")
    assert len(col.list_indexes()) == 1


def test_like_edge_semantics(spark):
    """filter_like_tests.rs rotation (rs:82-189): empty pattern matches
    only the empty string; bare %% does not match NULL; regex special
    chars are literal; \\%% and \\_ escape to literal wildcards; ILIKE
    folds case. DOCUMENTED DIVERGENCE (rs:150-154
    test_like_non_string_field): the reference's payloads are schemaless
    JSON, so a per-row non-string value makes LIKE false; Spark columns
    are uniformly typed, so LIKE on a non-string column follows SQL's
    implicit cast — a schema-level property, not a row-level one."""
    from velesdb_spark.functions.filters import filter_to_column

    df = spark.createDataFrame(
        [(1, "50%", "A_B", "a+b*c?", "Paris", ""),
         (2, "505", "AxB", "abc", None, "x")],
        "id bigint, discount string, code string, expr string, "
        "name string, empty string")

    def ids(cond):
        return sorted(r.id for r in df.filter(filter_to_column(cond)).collect())

    assert ids({"type": "like", "field": "discount",
                "pattern": "50\\%"}) == [1]
    assert ids({"type": "like", "field": "code", "pattern": "A\\_B"}) == [1]
    assert ids({"type": "like", "field": "expr", "pattern": "a+b*c?"}) == [1]
    assert ids({"type": "like", "field": "empty", "pattern": ""}) == [1]
    # % matches anything INCLUDING the empty string, but never NULL
    assert ids({"type": "like", "field": "empty", "pattern": "%"}) == [1, 2]
    assert ids({"type": "like", "field": "name", "pattern": "%"}) == [1]
    assert ids({"type": "ilike", "field": "code", "pattern": "a__"}) == [1, 2]
    # NOT over the definite booleans: NULL name is not-matched -> NOT -> true
    assert ids({"type": "not", "condition":
                {"type": "like", "field": "name", "pattern": "Par%"}}) == [2]

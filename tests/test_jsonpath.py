"""JsonPath parity — every shape from the reference's
velesql/json_path_tests.rs (19 tests) against functions/jsonpath.py,
plus the Spark column compiler the reference doesn't need.

All but the last test are pure Python (no SparkSession)."""

import pytest

from velesdb_spark.functions.jsonpath import (EmptyPath, EmptySegment,
                                              InvalidArrayIndex, JsonPath,
                                              JsonPathError, UnclosedBracket)


def test_parse_simple():
    """json_path_tests.rs:6-12."""
    p = JsonPath.parse("name")
    assert p.segments == ["name"]
    assert p.is_simple()


def test_parse_nested():
    """json_path_tests.rs:14-27."""
    p = JsonPath.parse("metadata.source")
    assert p.segments == ["metadata", "source"]
    assert not p.is_simple()


def test_parse_deep_nested():
    """json_path_tests.rs:29-33."""
    assert len(JsonPath.parse("a.b.c.d.e").segments) == 5


def test_parse_array_index():
    """json_path_tests.rs:35-41."""
    assert JsonPath.parse("items[0]").segments == ["items", 0]


def test_parse_array_with_property():
    """json_path_tests.rs:43-50."""
    assert JsonPath.parse("items[0].sku").segments == ["items", 0, "sku"]


def test_parse_empty_error():
    """json_path_tests.rs:52-59."""
    with pytest.raises(EmptyPath):
        JsonPath.parse("")
    with pytest.raises(EmptyPath):
        JsonPath.parse("   ")


def test_parse_double_dot_error():
    """json_path_tests.rs:61-67."""
    with pytest.raises(EmptySegment):
        JsonPath.parse("a..b")


def test_parse_unclosed_bracket_error():
    """json_path_tests.rs:69-75."""
    with pytest.raises(UnclosedBracket):
        JsonPath.parse("items[0")


def test_parse_invalid_index_error():
    """json_path_tests.rs:77-83."""
    with pytest.raises(InvalidArrayIndex):
        JsonPath.parse("items[abc]")
    with pytest.raises(InvalidArrayIndex):
        JsonPath.parse("items[-1]")  # usize: negatives don't parse
    # every variant is a JsonPathError
    for bad, exc in (("", EmptyPath), ("a..b", EmptySegment),
                     ("x[1", UnclosedBracket), ("x[z]", InvalidArrayIndex)):
        with pytest.raises(JsonPathError):
            JsonPath.parse(bad)
        assert issubclass(exc, JsonPathError)


def test_extract_simple():
    """json_path_tests.rs:85-90."""
    assert JsonPath.parse("name").extract({"name": "Alice", "age": 30}) == "Alice"


def test_extract_nested():
    """json_path_tests.rs:92-102."""
    doc = {"metadata": {"source": "web", "campaign": "summer"}}
    assert JsonPath.parse("metadata.source").extract(doc) == "web"


def test_extract_deep_nested():
    """json_path_tests.rs:104-116."""
    doc = {"profile": {"address": {"city": "Paris", "country": "FR"}}}
    assert JsonPath.parse("profile.address.city").extract(doc) == "Paris"


def test_extract_array():
    """json_path_tests.rs:118-131."""
    doc = {"items": [{"sku": "A1", "qty": 2}, {"sku": "B2", "qty": 1}]}
    assert JsonPath.parse("items[0].sku").extract(doc) == "A1"
    assert JsonPath.parse("items[1].sku").extract(doc) == "B2"


def test_extract_missing_returns_none():
    """json_path_tests.rs:133-141: missing key, and a property step into
    a non-object, are both misses."""
    doc = {"name": "Alice"}
    assert JsonPath.parse("nonexistent").extract(doc) is None
    assert JsonPath.parse("name.nested").extract(doc) is None
    assert JsonPath.parse("name[0]").extract(doc) is None  # index into str
    assert JsonPath.parse("items[5]").extract({"items": [1]}) is None


def test_extract_or_null():
    """json_path_tests.rs:143-151 (Python spells Value::Null as None)."""
    doc = {"name": "Alice"}
    assert JsonPath.parse("nonexistent").extract_or_null(doc) is None
    assert JsonPath.parse("name").extract_or_null(doc) == "Alice"


def test_root_property():
    """json_path_tests.rs:153-160: a leading array index has no root
    property."""
    assert JsonPath.parse("metadata.source").root_property() == "metadata"
    assert JsonPath.parse("[0].field").root_property() is None


def test_tail():
    """json_path_tests.rs:162-168."""
    tail = JsonPath.parse("a.b.c").tail()
    assert len(tail.segments) == 2
    assert str(tail) == "b.c"


def test_display():
    """json_path_tests.rs:170-177: str() round-trips the input."""
    assert str(JsonPath.parse("metadata.source")) == "metadata.source"
    assert str(JsonPath.parse("items[0].sku")) == "items[0].sku"


def test_serialization():
    """json_path_tests.rs:179-185: JSON round-trip preserves equality."""
    p = JsonPath.parse("metadata.source")
    assert JsonPath.from_json(p.to_json()) == p
    p2 = JsonPath.parse("items[0].sku")
    assert JsonPath.from_json(p2.to_json()) == p2
    assert p2 != p and hash(JsonPath.parse("a.b")) == hash(JsonPath.parse("a.b"))


def test_from_property_and_new():
    """json_path.rs:63-78 constructors."""
    assert JsonPath.from_property("name").segments == ["name"]
    assert JsonPath.from_property("name").is_simple()
    assert JsonPath().segments == []


# ---- beyond the rs file: the Spark column compiler ----

def test_to_jsonpath_string():
    assert JsonPath.parse("items[0].sku").to_jsonpath() == "$.items[0].sku"
    assert JsonPath.parse("a.b").to_jsonpath() == "$.a.b"
    assert JsonPath.parse("[2].x").to_jsonpath() == "$[2].x"


def test_to_column_extracts(spark):
    """to_column compiles to one get_json_object — same miss semantics as
    extract (NULL, never an error)."""
    df = spark.createDataFrame(
        [(1, '{"items":[{"sku":"A1"},{"sku":"B2"}],"meta":{"src":"web"}}'),
         (2, '{"items":[],"meta":{}}'),
         (3, None)],
        "id bigint, js string")
    out = df.select(
        "id",
        JsonPath.parse("items[1].sku").to_column("js").alias("sku"),
        JsonPath.parse("meta.src").to_column("js").alias("src"),
    ).orderBy("id").collect()
    assert [(r.id, r.sku, r.src) for r in out] == [
        (1, "B2", "web"), (2, None, None), (3, None, None)]

"""Open-payload (JSON) value semantics: mixed-type total order and
canonical-JSON DISTINCT.

Reference:
- ordering.rs:18-63 — ORDER BY over schemaless payload fields uses a
  type-ranked total order: Null < Bool < Number < String < Array < Object,
  NaN-safe numeric comparison inside the Number class.
- distinct.rs:12-78 — DISTINCT over open payloads dedups by canonical JSON
  with sorted object keys.

Typed columns don't need any of this (Spark's native ordering applies); these
helpers exist for MAP/variant/JSON-string payload columns. The sort key is a
plain struct expression, so sorting stays JVM-side; canonicalization of
arbitrary nested JSON uses an Arrow-batched pandas UDF (off the hot path —
at scale, prefer typed columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# type ranks (ordering.rs:18-63)
RANK_NULL, RANK_BOOL, RANK_NUMBER, RANK_STRING, RANK_ARRAY, RANK_OBJECT = range(6)


def json_type_rank(js: Column) -> Column:
    """Type rank of a JSON-encoded value (string column holding JSON text)."""
    t = F.trim(js)
    return (
        F.when(js.isNull() | (t == "null"), F.lit(RANK_NULL))
        .when((t == "true") | (t == "false"), F.lit(RANK_BOOL))
        .when(t.startswith('"'), F.lit(RANK_STRING))
        .when(t.startswith("["), F.lit(RANK_ARRAY))
        .when(t.startswith("{"), F.lit(RANK_OBJECT))
        .when(t.try_cast("double").isNotNull(), F.lit(RANK_NUMBER))
        .otherwise(F.lit(RANK_STRING))  # bare string fallback
    )


def mixed_order_key(js: Column) -> Column:
    """Sortable struct for a JSON-encoded value implementing the reference's
    total order. Compare structs field-by-field: (rank, bool, number,
    string). Arrays/objects compare by their JSON text within their rank
    class (deterministic; the reference compares serialized forms too)."""
    t = F.trim(js)
    rank = json_type_rank(js)
    as_bool = F.when(rank == RANK_BOOL, t == "true").otherwise(F.lit(False))
    as_num = F.when(rank == RANK_NUMBER, t.try_cast("double")).otherwise(F.lit(0.0))
    unquoted = F.when(
        rank == RANK_STRING,
        F.when(t.startswith('"'), F.get_json_object(js, "$")).otherwise(t),
    ).when(rank.isin(RANK_ARRAY, RANK_OBJECT), t).otherwise(F.lit(""))
    return F.struct(
        rank.alias("rank"),
        as_bool.cast("int").alias("b"),
        as_num.alias("n"),
        unquoted.alias("s"),
    )


@F.pandas_udf(StringType())
def canonical_json(js):  # type: ignore[misc]
    """Canonical JSON (sorted object keys, no whitespace) of a JSON text
    column — the reference's DISTINCT key (distinct.rs canonical form)."""
    import json

    def canon(x):
        if x is None:
            return None
        try:
            return json.dumps(json.loads(x), sort_keys=True,
                              separators=(",", ":"))
        except (ValueError, TypeError):
            return x  # not JSON: the raw string is its own canonical form

    return js.map(canon)


def canonical_map_json(m: Column) -> Column:
    """Canonical JSON for a MAP<STRING,STRING> column, fully JVM-side:
    entries sorted by key → JSON object text."""
    def jstr(s: Column) -> Column:
        # JSON string literal: escape backslash then quote
        esc = F.regexp_replace(F.regexp_replace(s, r"\\", r"\\\\"), '"', r'\\"')
        return F.concat(F.lit('"'), esc, F.lit('"'))

    entries = F.array_sort(F.map_entries(m))
    body = F.array_join(
        F.transform(
            entries,
            lambda e: F.concat(jstr(e.getField("key")), F.lit(":"),
                               jstr(e.getField("value"))),
        ),
        ",",
    )
    return F.when(m.isNull(), F.lit(None).cast("string")) \
        .otherwise(F.concat(F.lit("{"), body, F.lit("}")))


def distinct_by_canonical(df: DataFrame, cols: list[str],
                          json_cols: set[str] | None = None) -> DataFrame:
    """DISTINCT on ``cols`` where columns named in ``json_cols`` are
    compared by canonical JSON (insertion order NOT preserved — Spark is
    unordered; the reference preserves first-seen order, distinct.rs:12-78,
    which has no distributed meaning)."""
    json_cols = json_cols or set()
    keyed = df.withColumns({
        f"_canon_{c}": canonical_json(F.col(c)) for c in json_cols
    }) if json_cols else df
    dedup_cols = [f"_canon_{c}" if c in json_cols else c for c in cols]
    out = keyed.dropDuplicates(dedup_cols)
    return out.drop(*[f"_canon_{c}" for c in json_cols])

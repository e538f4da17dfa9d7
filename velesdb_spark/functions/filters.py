"""Programmatic Filter-condition trees → Spark Column expressions.

The reference's Python bindings accept JSON filter dicts that serde
deserializes into the `Condition` enum (filter/mod.rs:56-161, tagged
`{"type": "eq"|"neq"|...}`, snake_case) and evaluates row-at-a-time
(filter/matching.rs:9-43). Here the same dict compiles once into a native
Column expression, so the predicate runs JVM-side and stays eligible for
parquet pushdown — no per-row Python.

Null semantics mirror matching.rs exactly: every leaf yields a definite
boolean (missing/null field → false), except Neq which is TRUE on
missing/null (matching.rs:14-16); Not is pure negation over those definite
booleans (matching.rs:37).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


class FilterError(ValueError):
    pass


def _never_null(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


def _col(field: str) -> Column:
    # dot notation nests (matching.rs get_field:47-53); [i] indexing via expr
    if "[" in field:
        return F.expr(field)
    return F.col(field)


def filter_to_column(cond: dict) -> Column:
    """Compile a reference-format filter dict to a boolean Column.

    Accepts either the bare condition `{"type": ...}` or the full Filter
    wrapper `{"condition": {...}}` (filter/mod.rs:33-40).
    """
    if not isinstance(cond, dict):
        raise FilterError(f"filter must be a dict, got {type(cond).__name__}")
    if "condition" in cond and "type" not in cond:
        return filter_to_column(cond["condition"])
    t = cond.get("type")
    if t is None:
        raise FilterError("filter condition missing 'type'")

    if t in ("eq", "neq", "gt", "gte", "lt", "lte"):
        field, value = cond["field"], cond.get("value")
        c = _col(field)
        if t == "eq":
            # Eq with JSON null matches null fields (missing ≡ null in
            # columnar storage)
            return c.isNull() if value is None else _never_null(c == F.lit(value))
        if t == "neq":
            if value is None:
                return c.isNotNull()
            return ~c.eqNullSafe(F.lit(value))  # TRUE on null (matching.rs:14-16)
        lit = F.lit(value)
        ops = {"gt": c > lit, "gte": c >= lit, "lt": c < lit, "lte": c <= lit}
        return _never_null(ops[t])
    if t == "in":
        return _never_null(_col(cond["field"]).isin(list(cond["values"])))
    if t == "contains":
        # substring on string fields; false on null/non-string
        # (matching.rs:31-32)
        return _never_null(_col(cond["field"]).contains(str(cond["value"])))
    if t == "is_null":
        return _col(cond["field"]).isNull()
    if t == "is_not_null":
        return _col(cond["field"]).isNotNull()
    if t == "and":
        subs = [filter_to_column(c) for c in cond["conditions"]]
        if not subs:
            raise FilterError("'and' requires at least one condition")
        out = subs[0]
        for s in subs[1:]:
            out = out & s
        return out
    if t == "or":
        subs = [filter_to_column(c) for c in cond["conditions"]]
        if not subs:
            raise FilterError("'or' requires at least one condition")
        out = subs[0]
        for s in subs[1:]:
            out = out | s
        return out
    if t == "not":
        return ~filter_to_column(cond["condition"])
    if t == "like":
        return _never_null(_col(cond["field"]).like(str(cond["pattern"])))
    if t == "ilike":
        return _never_null(_col(cond["field"]).ilike(str(cond["pattern"])))
    raise FilterError(f"unknown filter condition type: {t!r}")

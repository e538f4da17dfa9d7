"""Array literals as ONE parsed SQL expression.

``F.array(*[F.lit(x) for x in vec])`` costs one py4j round-trip per
element — ~51 ms of pure driver latency for a dim-64 query vector, paid
on every query construction (measured on local[32], Spark 4.1). Parsing
the equivalent SQL text with ``F.expr`` is a single round-trip (~0.7 ms,
70× less) and yields the same expression tree: an ``array(...)`` call
over element literals, which ConstantFolding collapses to the identical
ARRAY literal either way — values and schema are bit-identical
(pinned in tests/test_vector.py).

Only finite doubles take the fast path; non-finite values (inf/nan have
no SQL literal form) fall back to the per-element builder, so callers
never need to pre-validate.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def double_array_sql(values: Sequence[float]) -> str | None:
    """SQL text of an ARRAY<DOUBLE> literal, for composing into larger
    one-shot ``F.expr`` strings (score expressions build the whole
    aggregate/zip_with tree as ONE parsed expression instead of dozens
    of py4j calls). None when a non-finite element means there is no SQL
    literal form — callers fall back to the Column builders."""
    xs = [float(x) for x in values]
    if not xs or not all(math.isfinite(x) for x in xs):
        return None
    return "array(" + ",".join(repr(x) + "D" for x in xs) + ")"


def double_array_lit(values: Sequence[float]) -> Column:
    """ARRAY<DOUBLE> literal. ``repr(float)`` is Python's shortest
    exact-round-trip form and Spark's double parser is correctly
    rounding, so the parsed value equals ``F.lit(float(x))`` bitwise."""
    xs = [float(x) for x in values]
    if not xs:
        return F.array().cast("array<double>")
    sql = double_array_sql(xs)
    if sql is not None:
        return F.expr(sql)
    return F.array(*[F.lit(x) for x in xs])


def long_array_lit(values: Sequence[int]) -> Column:
    """ARRAY<BIGINT> literal."""
    xs = [int(x) for x in values]
    if not xs:
        return F.array().cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{x}L" for x in xs) + ")")


def int_array_lit(values: Sequence[int]) -> Column:
    """ARRAY<INT> literal (matches ``F.array(*[F.lit(int)])``, which
    types Python ints that fit in 32 bits as INT)."""
    xs = [int(x) for x in values]
    if not xs:
        return F.array().cast("array<int>")
    return F.expr("array(" + ",".join(str(x) for x in xs) + ")")


def double_matrix_lit(rows: Sequence[Sequence[float]]) -> Column:
    """ARRAY<ARRAY<DOUBLE>> literal (PQ codebooks, centroid tables)."""
    mats = [[float(x) for x in r] for r in rows]
    if not mats:
        return F.array().cast("array<array<double>>")
    if all(math.isfinite(x) for r in mats for x in r):
        body = ",".join(
            "array(" + ",".join(repr(x) + "D" for x in r) + ")" for r in mats)
        return F.expr("array(" + body + ")")
    return F.array(*[F.array(*[F.lit(x) for x in r]) for r in mats])

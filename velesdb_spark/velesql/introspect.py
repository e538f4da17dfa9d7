"""Parsed-query introspection — the Python bindings' ``VelesQL.parse``
surface (crates/velesdb-python/src/velesql.rs): a ``ParsedStatement``
with is_select/is_match/table_name/table_alias/columns/has_* flags/
limit/offset/order_by/group_by/join_count, so an application that
inspects queries before executing them (routing, caching, auditing)
ports without touching its introspection code. The wrapper reads the
same AST the translator executes — there is exactly one parse."""

from __future__ import annotations

from typing import Optional

from velesdb_spark.velesql import ast
from velesdb_spark.velesql.lexer import VelesQLSyntaxError
from velesdb_spark.velesql.parser import parse


class ParsedStatement:
    """velesql.rs ParsedStatement (pymethods :102-340)."""

    def __init__(self, query):
        while isinstance(query, ast.Explain):
            query = query.query
        self._q = query
        # compound queries introspect their left arm, like the
        # reference's `select` field (ast/mod.rs Query.select)
        self._sel = (query.left if isinstance(query, ast.Compound)
                     else query if isinstance(query, ast.Select) else None)

    # ------------------------------------------------------------ kind
    def is_valid(self) -> bool:
        """Always True — invalid queries raise at parse (velesql.rs:108)."""
        return True

    def is_select(self) -> bool:
        return self._sel is not None

    def is_match(self) -> bool:
        return isinstance(self._q, ast.MatchQuery)

    # ---------------------------------------------------------- SELECT
    @property
    def table_name(self) -> Optional[str]:
        return self._sel.table if self._sel else None

    @property
    def table_alias(self) -> Optional[str]:
        return self._sel.table_alias if self._sel else None

    @property
    def columns(self) -> list[str]:
        if not self._sel:
            return []
        if not self._sel.columns:
            return ["*"]
        out = []
        for c in self._sel.columns:
            if isinstance(c, ast.Aggregate):
                # the reference renders the Debug name of the function
                # variant (Count/Sum/…) — velesql.rs:161-186
                out.append(c.func.capitalize())
            else:
                out.append(c.name)
        return out

    def has_distinct(self) -> bool:
        return bool(self._sel and self._sel.distinct)

    def has_where_clause(self) -> bool:
        return bool(self._sel and self._sel.where is not None)

    def has_order_by(self) -> bool:
        return bool(self._sel and self._sel.order_by)

    def has_group_by(self) -> bool:
        return bool(self._sel and self._sel.group_by)

    def has_having(self) -> bool:
        return bool(self._sel and self._sel.having is not None)

    def has_joins(self) -> bool:
        return bool(self._sel and self._sel.joins)

    def has_fusion(self) -> bool:
        return bool(self._sel and self._sel.fusion is not None)

    def has_vector_search(self) -> bool:
        """NEAR / NEAR_FUSED / similarity() anywhere in WHERE
        (velesql.rs:247-258 + condition_has_vector_search :372)."""
        from velesdb_spark.velesql.validation import contains_similarity

        return bool(self._sel and contains_similarity(self._sel.where))

    # ---------------------------------------------- WITH clause (hints)
    def with_option(self, key: str):
        """Case-insensitive WITH-option lookup (with_clause.rs:74-80)."""
        if not self._sel:
            return None
        for k, v in self._sel.with_options.items():
            if k.lower() == key.lower():
                return v
        return None

    @property
    def quantization(self) -> Optional[str]:
        """Canonical quantization mode ('f32'|'int8'|'dual'|'auto') from
        WITH (quantization=...), or None (with_clause.rs:116-120)."""
        from velesdb_spark.functions.quantization import (
            parse_quantization_mode)

        return parse_quantization_mode(self.with_option("quantization"))

    @property
    def oversampling(self) -> Optional[int]:
        """WITH (oversampling=N), clamped to ≥1 (with_clause.rs:127-131)."""
        v = self.with_option("oversampling")
        try:
            return max(int(v), 1) if v is not None else None
        except (TypeError, ValueError):
            return None

    @property
    def ef_search(self) -> Optional[int]:
        v = self.with_option("ef_search")
        return int(v) if v is not None else None

    @property
    def search_mode(self) -> Optional[str]:
        v = self.with_option("mode")
        return v if isinstance(v, str) else None

    @property
    def rerank(self) -> Optional[bool]:
        v = self.with_option("rerank")
        return v if isinstance(v, bool) else None

    @property
    def timeout_ms(self) -> Optional[int]:
        v = self.with_option("timeout_ms")
        return int(v) if v is not None else None

    # --------------------------------------------------------- routing
    def query_type(self) -> str:
        """Unified query routing (EPIC-052 detect_query_type,
        velesdb-server/src/handlers/query.rs:356-386): 'graph' for MATCH,
        else 'aggregation' for aggregate columns or GROUP BY, else
        'search' when the WHERE tree carries a vector predicate, else
        'rows'."""
        if self.is_match():
            return "graph"
        if self._sel and (self._sel.group_by or any(
                isinstance(c, ast.Aggregate) for c in self._sel.columns)):
            return "aggregation"
        if self.has_vector_search():
            return "search"
        return "rows"

    @property
    def limit(self) -> Optional[int]:
        return self._sel.limit if self._sel else None

    @property
    def offset(self) -> Optional[int]:
        return self._sel.offset if self._sel else None

    @property
    def order_by(self) -> list[tuple[str, str]]:
        if not self._sel:
            return []
        out = []
        for item in self._sel.order_by:
            if isinstance(item.expr, ast.Aggregate):
                col = item.expr.func.capitalize()
            elif isinstance(item.expr, ast.OrderBySimilarity):
                col = "similarity()"
            else:
                col = item.expr
            out.append((col, "ASC" if item.ascending else "DESC"))
        return out

    @property
    def group_by(self) -> list[str]:
        return list(self._sel.group_by) if self._sel else []

    @property
    def join_count(self) -> int:
        return len(self._sel.joins) if self._sel else 0

    def __repr__(self) -> str:
        kind = "MATCH" if self.is_match() else "SELECT"
        return f"ParsedStatement({kind} FROM {self.table_name or '<graph>'})"


class VelesQL:
    """velesql.rs VelesQL static API."""

    @staticmethod
    def parse(query: str) -> ParsedStatement:
        return ParsedStatement(parse(query))

    @staticmethod
    def is_valid(query: str) -> bool:
        """True iff the query parses (velesql.rs:82-88)."""
        try:
            parse(query)
            return True
        except VelesQLSyntaxError:
            return False

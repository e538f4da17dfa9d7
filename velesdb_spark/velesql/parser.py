"""VelesQL recursive-descent parser.

Covers the full surface of the reference grammar
(crates/velesdb-core/src/velesql/grammar.pest): SELECT with DISTINCT, joins
(INNER/LEFT/RIGHT/FULL, ON and USING), WHERE condition tree (comparisons, IN,
BETWEEN, LIKE/ILIKE, IS [NOT] NULL, MATCH, NEAR, NEAR_FUSED, similarity(),
AND/OR/NOT, parens), GROUP BY (nested paths), HAVING (AND/OR chains),
ORDER BY (columns, aggregates, similarity), LIMIT/OFFSET, WITH options,
USING FUSION, set operators, scalar subqueries, temporal NOW()/INTERVAL,
parameters, quoted identifiers, and Cypher-like MATCH graph queries.
"""

from __future__ import annotations

import functools

from velesdb_spark.velesql import ast
from velesdb_spark.velesql.lexer import Token, VelesQLSyntaxError, tokenize

# Reference defaults: query/mod.rs:60-61,84-87
DEFAULT_LIMIT = 10
MAX_LIMIT = 100_000

_INTERVAL_UNITS = {
    "second": 1, "seconds": 1, "sec": 1, "s": 1,
    "minute": 60, "minutes": 60, "min": 60, "m": 60,
    "hour": 3600, "hours": 3600, "h": 3600,
    "day": 86400, "days": 86400, "d": 86400,
    "week": 604800, "weeks": 604800, "w": 604800,
    "month": 2592000, "months": 2592000,  # 30 days (ast/values.rs:148-163)
}


def parse_interval(text: str) -> int:
    """'1 day' / '30 minutes' → seconds (ast/values.rs:148-163)."""
    parts = text.strip().split()
    if len(parts) != 2:
        raise VelesQLSyntaxError(f"invalid INTERVAL literal: {text!r}")
    try:
        n = int(parts[0])
    except ValueError as exc:
        raise VelesQLSyntaxError(f"invalid INTERVAL amount: {text!r}") from exc
    unit = parts[1].lower()
    if unit not in _INTERVAL_UNITS:
        raise VelesQLSyntaxError(f"unknown INTERVAL unit: {text!r}")
    return n * _INTERVAL_UNITS[unit]


class _Parser:
    def __init__(self, sql: str):
        self.tokens = tokenize(sql)
        self.i = 0

    # ---- token helpers -------------------------------------------------
    @property
    def cur(self) -> Token:
        return self.tokens[self.i]

    def peek(self, ahead: int = 1) -> Token:
        j = min(self.i + ahead, len(self.tokens) - 1)
        return self.tokens[j]

    def advance(self) -> Token:
        tok = self.cur
        if tok.kind != "EOF":
            self.i += 1
        return tok

    def at_kw(self, *kws: str) -> bool:
        return self.cur.kind == "KW" and self.cur.value in kws

    def accept_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.advance()
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.accept_kw(kw):
            raise VelesQLSyntaxError(f"expected {kw}, got {self.cur.value!r} at {self.cur.pos}")

    def at_punct(self, p: str) -> bool:
        return (self.cur.kind in ("PUNCT", "OP")) and self.cur.value == p

    def accept_punct(self, p: str) -> bool:
        if self.at_punct(p):
            self.advance()
            return True
        return False

    def expect_punct(self, p: str) -> None:
        if not self.accept_punct(p):
            raise VelesQLSyntaxError(f"expected {p!r}, got {self.cur.value!r} at {self.cur.pos}")

    def expect_number(self, what: str) -> float:
        """Numeric literal (INT/FLOAT, optional unary minus) or a clean
        syntax error — same no-panic contract as expect_int."""
        neg = False
        if (self.cur.kind == "OP" and self.cur.value == "-"):
            neg = True
            self.advance()
        tok = self.cur
        if tok.kind not in ("INT", "FLOAT"):
            raise VelesQLSyntaxError(
                f"expected number in {what}, got {tok.value!r} at {tok.pos}")
        self.advance()
        v = float(tok.value)
        return -v if neg else v

    def expect_int(self, what: str) -> int:
        """Integer literal or a clean syntax error — LIMIT/OFFSET must
        never surface a raw ValueError on malformed input (the parser's
        no-panic contract, fuzz_velesql_parser.rs)."""
        tok = self.cur
        if tok.kind != "INT":
            raise VelesQLSyntaxError(
                f"expected integer after {what}, got {tok.value!r} at {tok.pos}")
        self.advance()
        return int(tok.value)

    def maybe_alias(self):
        """Optional table alias: ``AS ident`` or a bare identifier
        (standard SQL — an executed superset of the reference, whose
        parser requires AS: join_extended_tests.rs:94-96 "FROM table
        alias not yet supported, only JOIN alias"). Safe without
        lookahead: everything that may legally follow a table name
        (JOIN/WHERE/GROUP/ORDER/LIMIT/WITH/USING/UNION/…) tokenizes as
        KW, never IDENT."""
        if self.accept_kw("AS"):
            return self.identifier()
        if self.cur.kind in ("IDENT", "QIDENT"):
            return self.identifier()
        return None

    def identifier(self) -> str:
        tok = self.cur
        if tok.kind in ("IDENT", "QIDENT"):
            self.advance()
            return tok.value
        # Aggregate-function names and some non-reserved keywords may be used
        # as identifiers when unambiguous (pest allows any identifier rule hit
        # first; we allowlist the safe ones).
        if tok.kind == "KW" and tok.value in ("COUNT", "SUM", "AVG", "MIN", "MAX", "MATCH"):
            self.advance()
            return tok.value.lower()
        raise VelesQLSyntaxError(f"expected identifier, got {tok.value!r} at {tok.pos}")

    def dotted_name(self) -> str:
        """identifier ('.' identifier)* — nested paths like metadata.source."""
        parts = [self.identifier()]
        while self.at_punct("."):
            self.advance()
            parts.append(self.identifier())
        return ".".join(parts)

    # ---- entry ---------------------------------------------------------
    def parse(self) -> ast.Query:
        if self.accept_kw("EXPLAIN"):
            analyze = self.accept_kw("ANALYZE")
            inner = self.parse()
            return ast.Explain(inner, analyze)
        if self.at_kw("MATCH"):
            q = self.match_query()
        else:
            q = self.compound_query()
        self.accept_punct(";")
        if self.cur.kind != "EOF":
            raise VelesQLSyntaxError(f"unexpected trailing input at {self.cur.pos}: {self.cur.value!r}")
        return q

    # ---- SELECT --------------------------------------------------------
    def compound_query(self) -> ast.Query:
        left = self.select_stmt()
        if self.at_kw("UNION", "INTERSECT", "EXCEPT"):
            op_tok = self.advance().value
            if op_tok == "UNION":
                op = "union_all" if self.accept_kw("ALL") else "union"
            else:
                op = op_tok.lower()
            right = self.select_stmt()
            return ast.Compound(left, op, right)
        return left

    def select_stmt(self) -> ast.Select:
        self.expect_kw("SELECT")
        distinct = self.accept_kw("DISTINCT")
        columns = self.select_list()
        self.expect_kw("FROM")
        table = self.identifier()
        table_alias = self.maybe_alias()

        joins = []
        while True:
            join = self.maybe_join()
            if join is None:
                break
            joins.append(join)

        where = self.or_expr() if self.accept_kw("WHERE") else None

        group_by: tuple = ()
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            cols = [self.dotted_name()]
            while self.accept_punct(","):
                cols.append(self.dotted_name())
            group_by = tuple(cols)

        having = self.having_clause() if self.accept_kw("HAVING") else None
        order_by = self.order_by_clause() if self.at_kw("ORDER") else ()

        limit = offset = None
        if self.accept_kw("LIMIT"):
            limit = self.expect_int("LIMIT")
        if self.accept_kw("OFFSET"):
            offset = self.expect_int("OFFSET")

        with_options: dict = {}
        if self.at_kw("WITH"):
            self.advance()
            self.expect_punct("(")
            while True:
                # option KEYS are case-insensitive (reference
                # pr_review_bugfix_tests.rs:218 — WITH (MAX_GROUPS=100)
                # must behave like max_groups); values keep their case
                name = self.identifier().lower()
                self.expect_punct("=")
                with_options[name] = self.with_value()
                if not self.accept_punct(","):
                    break
            self.expect_punct(")")

        fusion = None
        if self.accept_kw("USING"):
            self.expect_kw("FUSION")
            fusion = self.fusion_options()

        return ast.Select(
            table=table, table_alias=table_alias, columns=tuple(columns),
            distinct=distinct, joins=tuple(joins), where=where,
            group_by=group_by, having=having, order_by=order_by,
            limit=limit, offset=offset, with_options=with_options, fusion=fusion,
        )

    def select_list(self) -> list:
        if self.at_punct("*"):
            self.advance()
            return []
        items = [self.select_item()]
        while self.accept_punct(","):
            items.append(self.select_item())
        return items

    def select_item(self):
        if self.at_kw("COUNT", "SUM", "AVG", "MIN", "MAX") and self.peek().value == "(":
            agg = self.aggregate_function()
            alias = self.identifier() if self.accept_kw("AS") else None
            return ast.Aggregate(agg.func, agg.arg, alias)
        name = self.dotted_name()
        alias = self.identifier() if self.accept_kw("AS") else None
        return ast.Column(name, alias)

    def aggregate_function(self) -> ast.Aggregate:
        func = self.advance().value.lower()
        self.expect_punct("(")
        if self.at_punct("*"):
            self.advance()
            arg = "*"
        else:
            arg = self.dotted_name()
        self.expect_punct(")")
        if func != "count" and arg == "*":
            raise VelesQLSyntaxError(f"{func.upper()}(*) is not valid")
        return ast.Aggregate(func, arg)

    def maybe_join(self):
        how = None
        save = self.i
        if self.at_kw("INNER"):
            self.advance()
            how = "inner"
        elif self.at_kw("LEFT", "RIGHT", "FULL"):
            how = self.advance().value.lower()
            self.accept_kw("OUTER")
        if not self.at_kw("JOIN"):
            if how is not None:
                self.i = save
            return None
        self.advance()
        table = self.identifier()
        alias = self.maybe_alias()
        if self.accept_kw("ON"):
            left = self.dotted_name()
            self.expect_punct("=")
            right = self.dotted_name()
            return ast.Join(table, alias, how or "inner", left, right)
        if self.accept_kw("USING"):
            self.expect_punct("(")
            cols = [self.identifier()]
            while self.accept_punct(","):
                cols.append(self.identifier())
            self.expect_punct(")")
            return ast.Join(table, alias, how or "inner", using=tuple(cols))
        raise VelesQLSyntaxError("JOIN requires ON or USING clause")

    def having_clause(self) -> ast.Having:
        terms = [self.having_term()]
        ops = []
        while self.at_kw("AND", "OR"):
            ops.append(self.advance().value)
            terms.append(self.having_term())
        return ast.Having(tuple(terms), tuple(ops))

    def having_term(self) -> ast.HavingTerm:
        if not (self.at_kw("COUNT", "SUM", "AVG", "MIN", "MAX") and self.peek().value == "("):
            raise VelesQLSyntaxError("HAVING requires an aggregate function term")
        agg = self.aggregate_function()
        op = self.compare_op()
        value = self.value()
        return ast.HavingTerm(agg, op, value)

    def order_by_clause(self) -> tuple:
        self.expect_kw("ORDER")
        self.expect_kw("BY")
        items = [self.order_by_item()]
        while self.accept_punct(","):
            items.append(self.order_by_item())
        return tuple(items)

    def order_by_item(self) -> ast.OrderByItem:
        if self.at_kw("SIMILARITY") and self.peek().value == "(":
            self.advance()
            self.expect_punct("(")
            field = self.dotted_name()
            self.expect_punct(",")
            vec = self.vector_value()
            self.expect_punct(")")
            expr: object = ast.OrderBySimilarity(field, vec)
        elif self.at_kw("COUNT", "SUM", "AVG", "MIN", "MAX") and self.peek().value == "(":
            expr = self.aggregate_function()
        else:
            expr = self.dotted_name()
        # Default direction: plain fields/aggregates sort ASC, but a bare
        # ORDER BY similarity(...) defaults to DESC — most similar first
        # (similarity_tests.rs:332-348 test_order_by_similarity_default_desc)
        ascending = not isinstance(expr, ast.OrderBySimilarity)
        if self.accept_kw("DESC"):
            ascending = False
        elif self.accept_kw("ASC"):
            ascending = True
        return ast.OrderByItem(expr, ascending)

    def with_value(self):
        tok = self.cur
        if tok.kind == "INT":
            self.advance()
            return int(tok.value)
        if tok.kind == "FLOAT":
            self.advance()
            return float(tok.value)
        if tok.kind == "STRING":
            self.advance()
            return tok.value
        if tok.kind == "KW" and tok.value in ("TRUE", "FALSE"):
            self.advance()
            return tok.value == "TRUE"
        return self.identifier()

    def fusion_options(self) -> ast.FusionSpec:
        strategy = "rrf"
        params: dict = {}
        if self.cur.kind == "STRING":
            strategy = self.advance().value.lower()
        if self.accept_punct("("):
            while True:
                name = self.identifier()
                self.expect_punct("=")
                tok = self.advance()
                if tok.kind == "INT":
                    params[name] = int(tok.value)
                elif tok.kind == "FLOAT":
                    params[name] = float(tok.value)
                elif tok.kind == "STRING":
                    params[name] = tok.value
                else:
                    raise VelesQLSyntaxError(f"bad fusion param value {tok.value!r}")
                if not self.accept_punct(","):
                    break
            self.expect_punct(")")
        # the key=value spelling may name the strategy as a parameter
        # (fusion_clause_tests.rs:54-97: USING FUSION(strategy =
        # 'maximum') must set the strategy FIELD, not leave the default)
        if isinstance(params.get("strategy"), str):
            strategy = params["strategy"].lower()
        return ast.FusionSpec(strategy, params)

    # ---- conditions ----------------------------------------------------
    def or_expr(self):
        terms = [self.and_expr()]
        while self.accept_kw("OR"):
            terms.append(self.and_expr())
        return terms[0] if len(terms) == 1 else ast.Or(tuple(terms))

    def and_expr(self):
        terms = [self.primary_expr()]
        while self.accept_kw("AND"):
            terms.append(self.primary_expr())
        return terms[0] if len(terms) == 1 else ast.And(tuple(terms))

    def primary_expr(self):
        if self.accept_kw("NOT"):
            return ast.Not(self.primary_expr())
        if self.at_punct("("):
            if self.peek().kind == "KW" and self.peek().value == "SELECT":
                # (SELECT ...) op value — LHS scalar subquery
                self.advance()
                stmt = self.select_stmt()
                self.expect_punct(")")
                op = self.compare_op()
                return ast.SubqueryCompare(ast.Subquery(stmt), op, self.value())
            self.advance()
            inner = self.or_expr()
            self.expect_punct(")")
            return inner
        if self.accept_kw("EXISTS"):
            self.expect_punct("(")
            stmt = self.select_stmt()
            self.expect_punct(")")
            return ast.Exists(stmt)
        if self.at_kw("SIMILARITY") and self.peek().value == "(":
            return self.similarity_expr()
        # vector NEAR / NEAR_FUSED: 'vector' lexes as IDENT
        if self.cur.kind == "IDENT" and self.cur.value.lower() == "vector" and self.peek().kind == "KW" \
                and self.peek().value in ("NEAR", "NEAR_FUSED"):
            return self.vector_search_expr()
        return self.column_predicate()

    def similarity_expr(self) -> ast.Similarity:
        self.advance()  # similarity
        self.expect_punct("(")
        field = self.dotted_name()
        self.expect_punct(",")
        vec = self.vector_value()
        self.expect_punct(")")
        op = self.compare_op()
        tok = self.advance()
        if tok.kind not in ("FLOAT", "INT"):
            raise VelesQLSyntaxError(f"similarity threshold must be numeric, got {tok.value!r}")
        return ast.Similarity(field, vec, op, float(tok.value))

    def vector_search_expr(self):
        self.advance()  # 'vector'
        kw = self.advance().value
        if kw == "NEAR":
            return ast.VectorSearch(self.vector_value())
        # NEAR_FUSED [v1, v2, ...]
        self.expect_punct("[")
        vectors = [self.vector_value()]
        while self.accept_punct(","):
            vectors.append(self.vector_value())
        self.expect_punct("]")
        fusion = None
        if self.accept_kw("USING"):
            self.expect_kw("FUSION")
            fusion = self.fusion_options()
        return ast.VectorFusedSearch(tuple(vectors), fusion)

    def vector_value(self):
        if self.cur.kind == "PARAM":
            return ast.Param(self.advance().value)
        self.expect_punct("[")
        vals = [self.expect_number("vector literal")]
        while self.accept_punct(","):
            vals.append(self.expect_number("vector literal"))
        self.expect_punct("]")
        return vals

    def column_predicate(self):
        column = self.dotted_name()
        # JSON-path array indexing: items[0].sku (velesql/json_path.rs:36-61)
        while self.at_punct("["):
            self.advance()
            idx = self.advance().value
            self.expect_punct("]")
            column += f"[{idx}]"
            while self.at_punct("."):
                self.advance()
                column += "." + self.identifier()
        if self.accept_kw("IN"):
            self.expect_punct("(")
            if self.at_kw("SELECT"):  # IN (SELECT ...) membership subquery
                stmt = self.select_stmt()
                self.expect_punct(")")
                return ast.In(column, ast.Subquery(stmt))
            vals = [self.value()]
            while self.accept_punct(","):
                vals.append(self.value())
            self.expect_punct(")")
            return ast.In(column, tuple(vals))
        if self.accept_kw("BETWEEN"):
            low = self.value()
            self.expect_kw("AND")
            high = self.value()
            return ast.Between(column, low, high)
        if self.at_kw("LIKE", "ILIKE"):
            ci = self.advance().value == "ILIKE"
            tok = self.advance()
            if tok.kind != "STRING":
                raise VelesQLSyntaxError("LIKE pattern must be a string")
            return ast.Like(column, tok.value, ci)
        if self.accept_kw("IS"):
            negated = self.accept_kw("NOT")
            self.expect_kw("NULL")
            return ast.IsNull(column, negated)
        if self.accept_kw("MATCH"):
            tok = self.advance()
            if tok.kind != "STRING":
                raise VelesQLSyntaxError("MATCH query must be a string")
            return ast.MatchText(column, tok.value)
        op = self.compare_op()
        return ast.Compare(column, op, self.value())

    def compare_op(self) -> str:
        tok = self.cur
        if tok.kind == "OP" and tok.value in (">=", "<=", "<>", "!=", "=", ">", "<"):
            self.advance()
            return tok.value
        raise VelesQLSyntaxError(f"expected comparison operator, got {tok.value!r} at {tok.pos}")

    # ---- values --------------------------------------------------------
    def value(self):
        tok = self.cur
        if tok.kind == "INT":
            self.advance()
            return int(tok.value)
        if tok.kind == "FLOAT":
            self.advance()
            return float(tok.value)
        if tok.kind == "STRING":
            self.advance()
            return tok.value
        if tok.kind == "PARAM":
            self.advance()
            return ast.Param(tok.value)
        if tok.kind == "KW":
            if tok.value == "NULL":
                self.advance()
                return None
            if tok.value in ("TRUE", "FALSE"):
                self.advance()
                return tok.value == "TRUE"
            if tok.value in ("NOW", "INTERVAL"):
                return self.temporal_expr()
        if self.at_punct("(") and self.peek().kind == "KW" and self.peek().value == "SELECT":
            self.advance()
            stmt = self.select_stmt()
            self.expect_punct(")")
            return ast.Subquery(stmt)
        if self.at_punct("["):  # vector literal as a value
            return self.vector_value()
        if tok.kind in ("IDENT", "QIDENT"):
            # column-to-column comparison (extension; see ast.ColumnRef)
            return ast.ColumnRef(self.dotted_name())
        raise VelesQLSyntaxError(f"expected value, got {tok.value!r} at {tok.pos}")

    def temporal_expr(self):
        left = self.temporal_atom()
        if self.at_punct("+") or self.at_punct("-"):
            op = self.advance().value
            right = self.temporal_atom()
            return ast.TemporalArith(left, op, right)
        return left

    def temporal_atom(self):
        if self.accept_kw("NOW"):
            self.expect_punct("(")
            self.expect_punct(")")
            return ast.Now()
        if self.accept_kw("INTERVAL"):
            tok = self.advance()
            if tok.kind != "STRING":
                raise VelesQLSyntaxError("INTERVAL requires a string literal")
            return ast.Interval(parse_interval(tok.value))
        raise VelesQLSyntaxError(f"expected NOW() or INTERVAL, got {self.cur.value!r}")

    # ---- MATCH (graph) -------------------------------------------------
    def match_query(self) -> ast.MatchQuery:
        self.expect_kw("MATCH")
        # named path pattern: MATCH p = (a)-[:R]->(b)
        # (match_clause.rs:272-283 parse_pattern_list binds the name; the
        # reference stores it on GraphPattern and execution ignores it)
        path_name = None
        if (self.cur.kind == "IDENT" and self.peek().kind == "OP"
                and self.peek().value == "="):
            path_name = self.cur.value
            self.advance()
            self.advance()
        nodes = [self.node_pattern()]
        rels = []
        while self.at_punct("-") or self.at_punct("<-"):
            rels.append(self.rel_pattern())
            nodes.append(self.node_pattern())
        where = self.or_expr() if self.accept_kw("WHERE") else None
        self.expect_kw("RETURN")
        returns = [self.return_item()]
        while self.accept_punct(","):
            returns.append(self.return_item())
        order_by = self.order_by_clause() if self.at_kw("ORDER") else ()
        limit = None
        if self.accept_kw("LIMIT"):
            limit = self.expect_int("LIMIT")
        return ast.MatchQuery(tuple(nodes), tuple(rels), where,
                              tuple(returns), order_by, limit,
                              path_name=path_name)

    def node_pattern(self) -> ast.NodePattern:
        self.expect_punct("(")
        alias = None
        labels: list[str] = []
        props: list[tuple] = []
        if self.cur.kind in ("IDENT", "QIDENT"):
            alias = self.identifier()
        while self.at_punct(":"):
            self.advance()
            labels.append(self.identifier())
        if self.at_punct("{"):
            props = self.property_map()
        self.expect_punct(")")
        return ast.NodePattern(alias, tuple(labels), tuple(props))

    def property_map(self) -> list[tuple]:
        self.expect_punct("{")
        props = []
        while True:
            name = self.identifier()
            self.expect_punct(":")
            props.append((name, self.value()))
            if not self.accept_punct(","):
                break
        self.expect_punct("}")
        return props

    def rel_pattern(self) -> ast.RelPattern:
        incoming = False
        if self.at_punct("<-"):
            self.advance()
            incoming = True
        else:
            self.expect_punct("-")
        alias = None
        types: list[str] = []
        min_d = max_d = 1
        props: list[tuple] = []
        if self.at_punct("["):
            self.advance()
            if self.cur.kind in ("IDENT", "QIDENT"):
                alias = self.identifier()
            if self.at_punct(":"):
                self.advance()
                types.append(self.identifier())
                while self.at_punct("|"):
                    self.advance()
                    types.append(self.identifier())
            if self.at_punct("*"):
                self.advance()
                min_d, max_d = self.rel_range()
            if self.at_punct("{"):
                props = self.property_map()
            self.expect_punct("]")
        if incoming:
            self.expect_punct("-")
            direction = "in"
        else:
            if self.accept_punct("->"):
                direction = "out"
            else:
                self.expect_punct("-")
                direction = "both"
        return ast.RelPattern(alias, tuple(types), direction, min_d, max_d, tuple(props))

    def rel_range(self) -> tuple[int, int]:
        # *, *n, *n..m, *n.., *..m  (grammar range_spec; default max 3 per
        # traversal.rs:17-28 when unbounded)
        default_max = 3
        if self.at_punct("]") or self.at_punct("{"):
            return 1, default_max
        lo = None
        if self.cur.kind == "INT":
            lo = int(self.advance().value)
        if self.at_punct(".."):
            self.advance()
            hi = int(self.advance().value) if self.cur.kind == "INT" else default_max
            return (lo if lo is not None else 1), hi
        if lo is not None:  # *n — exactly n
            return lo, lo
        return 1, default_max

    def return_item(self) -> ast.ReturnItem:
        if self.at_punct("*"):
            self.advance()
            expr = "*"
        elif self.at_kw("SIMILARITY") and self.peek().value == "(":
            self.advance()
            self.expect_punct("(")
            self.expect_punct(")")
            expr = "similarity()"
        elif self.at_kw("COUNT") and self.peek().value == "(":
            # RETURN count(*) — Cypher-style implicit grouping over the
            # other return items (graph_pattern_tests.rs:126-135 stores
            # the expression; execution here is beyond-reference headroom)
            self.advance()
            self.expect_punct("(")
            self.expect_punct("*")
            self.expect_punct(")")
            expr = "count(*)"
        else:
            expr = self.dotted_name()
        alias = self.identifier() if self.accept_kw("AS") else None
        return ast.ReturnItem(expr, alias)


@functools.lru_cache(maxsize=1024)
def parse(sql: str) -> ast.Query:
    """Parse VelesQL → AST. LRU-cached (reference: velesql/cache.rs LRU parse
    cache, 84 ns hits — ours is functools.lru_cache over the query string)."""
    return _Parser(sql).parse()

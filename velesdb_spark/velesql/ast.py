"""VelesQL AST — mirrors the language surface of the reference grammar
(crates/velesdb-core/src/velesql/grammar.pest and velesql/ast/*.rs) as plain
Python dataclasses. The AST is engine-agnostic; translation to Spark lives in
translator.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union

# ---------------------------------------------------------------- values


@dataclass(frozen=True)
class Param:
    """$name parameter (velesql/ast/values.rs:19-36)."""

    name: str


@dataclass(frozen=True)
class Now:
    """NOW() — epoch seconds at eval time (ast/values.rs:89-122)."""


@dataclass(frozen=True)
class Interval:
    """INTERVAL '<n> <unit>' — seconds (ast/values.rs:148-163)."""

    seconds: int


@dataclass(frozen=True)
class TemporalArith:
    """NOW() ± INTERVAL — resolved to epoch seconds."""

    left: Union[Now, Interval]
    op: str  # '+' | '-'
    right: Union[Now, Interval]


@dataclass(frozen=True)
class Subquery:
    """Scalar subquery value (ast/values.rs Subquery; EPIC-039)."""

    stmt: "Select"


@dataclass(frozen=True)
class ColumnRef:
    """Bare identifier on the right-hand side of a comparison — a
    column-to-column compare. Extension beyond the reference grammar (whose
    `value` rule has no column refs); needed for expressive self-joins."""

    name: str


Value = Any  # int | float | str | bool | None | Param | Now | Interval | TemporalArith | Subquery | list

# ---------------------------------------------------------------- conditions


@dataclass(frozen=True)
class Compare:
    column: str
    op: str  # = != <> > >= < <=
    value: Value


@dataclass(frozen=True)
class In:
    column: str
    values: tuple


@dataclass(frozen=True)
class Between:
    """Inclusive (ast/condition.rs:109-117)."""

    column: str
    low: Value
    high: Value


@dataclass(frozen=True)
class Like:
    column: str
    pattern: str
    case_insensitive: bool = False  # ILIKE


@dataclass(frozen=True)
class IsNull:
    column: str
    negated: bool = False


@dataclass(frozen=True)
class MatchText:
    """column MATCH 'query' — BM25 full-text predicate (ast/condition.rs:140-147)."""

    column: str
    query: str


@dataclass(frozen=True)
class VectorSearch:
    """vector NEAR $v (grammar.pest:169-171)."""

    vector: Value  # list[float] | Param


@dataclass(frozen=True)
class FusionSpec:
    """USING FUSION 'strategy'(k=..., ...) (ast/fusion.rs:10-60)."""

    strategy: str = "rrf"
    params: dict = field(default_factory=dict)


@dataclass(frozen=True)
class VectorFusedSearch:
    """vector NEAR_FUSED [v1,v2,...] USING FUSION ... (ast/condition.rs:50-56)."""

    vectors: tuple
    fusion: Optional[FusionSpec] = None


@dataclass(frozen=True)
class Similarity:
    """similarity(field, $v) op threshold (grammar similarity_expr)."""

    field_name: str
    vector: Value
    op: str
    threshold: float


@dataclass(frozen=True)
class SubqueryCompare:
    """(SELECT agg(...) ...) op value — scalar subquery on the left-hand
    side of a comparison (the COUNT(*)-guard idiom)."""

    sub: Subquery
    op: str
    value: Value


@dataclass(frozen=True)
class Exists:
    """EXISTS (SELECT ...) — correlated or not. Correlated equality
    predicates (inner.col = outer.col) are decorrelated to a semi-join-shaped
    flag join at translation (the PerRow strategy surface of the reference's
    velesql/subquery_optimizer.rs:10-42, executed set-at-a-time here)."""

    stmt: "Select"


@dataclass(frozen=True)
class And:
    conditions: tuple


@dataclass(frozen=True)
class Or:
    conditions: tuple


@dataclass(frozen=True)
class Not:
    condition: Any


Condition = Any

# ---------------------------------------------------------------- select parts


@dataclass(frozen=True)
class Column:
    """Select-list column; name may be a dot path (metadata.source)."""

    name: str
    alias: Optional[str] = None


@dataclass(frozen=True)
class Aggregate:
    """COUNT/SUM/AVG/MIN/MAX(arg) [AS alias]; arg '*' for COUNT(*).

    Default output names follow the reference (aggregation.rs:271-289):
    count, count_col, sum_col, avg_col, min_col, max_col.
    """

    func: str  # count|sum|avg|min|max
    arg: str  # '*' or column name (dot path ok)
    alias: Optional[str] = None

    @property
    def output_name(self) -> str:
        if self.alias:
            return self.alias
        if self.func == "count" and self.arg == "*":
            return "count"
        return f"{self.func}_{self.arg.replace('.', '_')}"


@dataclass(frozen=True)
class OrderBySimilarity:
    field_name: str
    vector: Value


@dataclass(frozen=True)
class OrderByItem:
    # expr: str column name | Aggregate | OrderBySimilarity
    expr: Any
    ascending: bool = True


@dataclass(frozen=True)
class Join:
    table: str
    alias: Optional[str]
    how: str  # inner|left|right|full
    left_col: Optional[str] = None  # qualified a.x
    right_col: Optional[str] = None  # qualified b.y
    using: tuple = ()


@dataclass(frozen=True)
class HavingTerm:
    agg: Aggregate
    op: str
    value: Value


@dataclass(frozen=True)
class Having:
    """Terms chained with AND/OR (aggregation.rs:609-644)."""

    terms: tuple  # of HavingTerm
    ops: tuple = ()  # of 'AND' | 'OR', len == len(terms) - 1


@dataclass(frozen=True)
class Select:
    table: str
    table_alias: Optional[str] = None
    columns: tuple = ()  # of Column | Aggregate; empty => SELECT *
    distinct: bool = False
    joins: tuple = ()
    where: Optional[Condition] = None
    group_by: tuple = ()
    having: Optional[Having] = None
    order_by: tuple = ()
    limit: Optional[int] = None
    offset: Optional[int] = None
    with_options: dict = field(default_factory=dict)
    fusion: Optional[FusionSpec] = None


@dataclass(frozen=True)
class Compound:
    """SELECT <setop> SELECT (ast/mod.rs:97-117)."""

    left: Select
    op: str  # union|union_all|intersect|except
    right: Select


# ---------------------------------------------------------------- MATCH (graph)


@dataclass(frozen=True)
class NodePattern:
    alias: Optional[str] = None
    labels: tuple = ()
    properties: tuple = ()  # of (name, value)


@dataclass(frozen=True)
class RelPattern:
    alias: Optional[str] = None
    types: tuple = ()
    direction: str = "out"  # out|in|both
    min_depth: int = 1
    max_depth: int = 1
    properties: tuple = ()


@dataclass(frozen=True)
class ReturnItem:
    # expr: '*' | 'alias' | 'alias.prop' | 'similarity()'
    expr: str
    alias: Optional[str] = None


@dataclass(frozen=True)
class MatchQuery:
    nodes: tuple = ()  # of NodePattern, len == len(rels) + 1
    rels: tuple = ()  # of RelPattern
    where: Optional[Condition] = None
    returns: tuple = ()  # of ReturnItem
    order_by: tuple = ()
    limit: Optional[int] = None
    # named path pattern binding (MATCH p = (...); match_clause.rs:272-283
    # — the reference parses and stores it, execution ignores it)
    path_name: Optional[str] = None


@dataclass(frozen=True)
class Explain:
    """EXPLAIN [ANALYZE] <query> (velesql/explain.rs; REST /query/explain).
    ANALYZE executes the query and appends runtime stats (explain.rs
    ExplainAnalyzeStats)."""

    query: "Query"
    analyze: bool = False


Query = Union[Select, Compound, MatchQuery]

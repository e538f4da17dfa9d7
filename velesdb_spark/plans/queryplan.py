"""Structured EXPLAIN query plan — full parity with the reference's
``velesql/explain.rs`` (QueryPlan / PlanNode / IndexType / FilterStrategy /
ExplainOutput), executed over the Python AST.

The reference exposes EXPLAIN two ways: a rendered tree (``to_tree``,
explain.rs:410-431) and JSON (``to_json``, explain.rs:513-515), both built
from a typed plan whose node costs and filter-strategy selection are fixed
heuristics (explain.rs:296-330). This module reproduces those numbers and
strings exactly so API consumers that parse the reference's EXPLAIN output
can parse ours; Catalyst still owns the REAL physical plan (the
``Collection.explain`` surface emits both views, plans/explain.py renders
the legacy flat tree).

Index-type mapping note: the reference reports ``HNSW`` for any vector
search because that is its index; our execution is an exact distributed
top-k, but the PLAN REPORT keeps the reference's field values
(explain_tests.rs:62 asserts ``IndexType::Hnsw``) so downstream tooling
ports unchanged — the honest execution story lives in ``df.explain()``.

Parity: explain.rs:24-177 (types), 179-330 (from_select + costs),
332-408 (from_match), 410-515 (rendering), 518-556 (as_str tables);
tested by explain_tests.rs (all 24 shapes mirrored in
tests/test_queryplan.py).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

from velesdb_spark.velesql import ast


class IndexType:
    """explain.rs:154-165 / 518-529."""

    HNSW = "Hnsw"
    FLAT = "Flat"
    BINARY_QUANTIZATION = "BinaryQuantization"
    PROPERTY = "Property"

    _STR = {HNSW: "HNSW", FLAT: "Flat",
            BINARY_QUANTIZATION: "BinaryQuantization",
            PROPERTY: "PropertyIndex"}

    @classmethod
    def as_str(cls, v: str) -> str:
        return cls._STR[v]


class FilterStrategy:
    """explain.rs:167-177 / 531-541."""

    NONE = "None"
    PRE_FILTER = "PreFilter"
    POST_FILTER = "PostFilter"

    _STR = {NONE: "none",
            PRE_FILTER: "pre-filtering (high selectivity)",
            POST_FILTER: "post-filtering (low selectivity)"}

    @classmethod
    def as_str(cls, v: str) -> str:
        return cls._STR[v]

    @classmethod
    def default(cls) -> str:
        return cls.NONE


#: CompareOp::as_str (explain.rs:543-556) — ops are already strings in the
#: Python AST; the table pins the reference's spelling (<> normalizes to !=).
COMPARE_OP_STR = {"=": "=", "!=": "!=", "<>": "!=", ">": ">", ">=": ">=",
                  "<": "<", "<=": "<="}


def compare_op_as_str(op: str) -> str:
    return COMPARE_OP_STR[op]


# ------------------------------------------------------------------ nodes

@dataclass
class VectorSearchPlan:
    collection: str
    ef_search: int = 100
    candidates: int = 50


@dataclass
class FilterPlan:
    conditions: str
    selectivity: float


@dataclass
class LimitPlan:
    count: int


@dataclass
class OffsetPlan:
    count: int


@dataclass
class TableScanPlan:
    collection: str


@dataclass
class IndexLookupPlan:
    label: str
    property: str
    value: str


@dataclass
class MatchTraversalPlan:
    strategy: str
    start_labels: list = field(default_factory=list)
    max_depth: int = 1
    relationship_count: int = 0
    has_similarity: bool = False
    similarity_threshold: Optional[float] = None


# A Sequence node is a plain Python list of nodes (explain.rs PlanNode::Sequence).
PlanNode = object


def _node_tag(node) -> str:
    if isinstance(node, list):
        return "Sequence"
    return type(node).__name__.removesuffix("Plan")


# ------------------------------------------------------------------ plan

@dataclass
class QueryPlan:
    root: PlanNode
    estimated_cost_ms: float
    index_used: Optional[str] = None          # an IndexType constant
    filter_strategy: str = FilterStrategy.NONE

    # ---------------------------------------------------- construction
    @classmethod
    def from_select(cls, stmt: ast.Select) -> "QueryPlan":
        """explain.rs:179-248 — analyze WHERE for vector search + filters,
        then assemble VectorSearch|TableScan → Filter → Offset → Limit."""
        has_vs = [False]
        filter_conditions: list[str] = []
        if stmt.where is not None:
            cls._analyze_condition(stmt.where, has_vs, filter_conditions)

        nodes: list = []
        index_used = None
        filter_strategy = FilterStrategy.NONE
        if has_vs[0]:
            index_used = IndexType.HNSW
            nodes.append(VectorSearchPlan(
                collection=stmt.table, ef_search=100,
                candidates=stmt.limit if stmt.limit is not None else 50))
        else:
            nodes.append(TableScanPlan(collection=stmt.table))

        if filter_conditions:
            selectivity = cls.estimate_selectivity(filter_conditions)
            filter_strategy = (FilterStrategy.POST_FILTER
                               if selectivity > 0.1
                               else FilterStrategy.PRE_FILTER)
            nodes.append(FilterPlan(conditions=" AND ".join(filter_conditions),
                                    selectivity=selectivity))

        if stmt.offset:
            nodes.append(OffsetPlan(count=stmt.offset))
        if stmt.limit is not None:
            nodes.append(LimitPlan(count=stmt.limit))

        root = nodes[0] if len(nodes) == 1 else nodes
        return cls(root=root,
                   estimated_cost_ms=cls.estimate_cost(root, has_vs[0]),
                   index_used=index_used, filter_strategy=filter_strategy)

    @classmethod
    def from_match(cls, q: ast.MatchQuery, stats=None) -> "QueryPlan":
        """explain.rs:332-408 — plan the MATCH via the planner, lift the
        chosen strategy into a MatchTraversal node."""
        from velesdb_spark.plans.match_planner import (GraphFirst, Parallel,
                                                       PlannerStats,
                                                       VectorFirst,
                                                       explain_strategy, plan)

        stats = stats or PlannerStats()
        strategy = plan(q, stats)
        if isinstance(strategy, GraphFirst):
            start_labels = list(strategy.start_labels)
            max_depth = strategy.max_depth
            has_sim, threshold = False, None
        elif isinstance(strategy, VectorFirst):
            start_labels, max_depth = [], 1
            has_sim, threshold = True, strategy.threshold
        elif isinstance(strategy, Parallel):
            start_labels = list(strategy.graph_hint.start_labels)
            max_depth = strategy.graph_hint.max_depth
            has_sim, threshold = True, strategy.vector_hint.threshold
        else:  # pragma: no cover - planner returns the three above
            start_labels, max_depth, has_sim, threshold = [], 1, False, None

        nodes: list = [MatchTraversalPlan(
            strategy=explain_strategy(strategy),
            start_labels=start_labels, max_depth=max_depth,
            relationship_count=len(q.rels),
            has_similarity=has_sim, similarity_threshold=threshold)]
        if q.limit is not None:
            nodes.append(LimitPlan(count=q.limit))
        root = nodes[0] if len(nodes) == 1 else nodes
        return cls(root=root,
                   estimated_cost_ms=cls.estimate_cost(root, has_sim),
                   index_used=IndexType.HNSW if has_sim else None,
                   filter_strategy=FilterStrategy.NONE)

    @classmethod
    def _analyze_condition(cls, cond, has_vs: list, filters: list) -> None:
        """explain.rs:250-293 — filter spellings match byte-for-byte."""
        if isinstance(cond, (ast.VectorSearch, ast.VectorFusedSearch,
                             ast.Similarity)):
            has_vs[0] = True
        elif isinstance(cond, ast.Compare):
            filters.append(f"{cond.column} {compare_op_as_str(cond.op)} ?")
        elif isinstance(cond, ast.In):
            filters.append(f"{cond.column} IN (...)")
        elif isinstance(cond, ast.Between):
            filters.append(f"{cond.column} BETWEEN ? AND ?")
        elif isinstance(cond, ast.Like):
            filters.append(f"{cond.column} LIKE ?")
        elif isinstance(cond, ast.IsNull):
            filters.append(f"{cond.column} "
                           f"{'IS NOT NULL' if cond.negated else 'IS NULL'}")
        elif isinstance(cond, ast.MatchText):
            filters.append(f"{cond.column} MATCH ?")
        elif isinstance(cond, (ast.And, ast.Or)):
            for c in cond.conditions:
                cls._analyze_condition(c, has_vs, filters)
        elif isinstance(cond, ast.Not):
            cls._analyze_condition(cond.condition, has_vs, filters)
        # Exists / SubqueryCompare have no reference counterpart: the plan
        # report skips them (the Catalyst explain carries the join shape)

    # ---------------------------------------------------- cost model
    @staticmethod
    def estimate_selectivity(conditions: list[str]) -> float:
        """explain.rs:296-300 — 0.5^n, more conditions = more selective."""
        return 0.5 ** len(conditions)

    @classmethod
    def estimate_cost(cls, root, has_vector_search: bool) -> float:
        """explain.rs:303-312."""
        base = 0.05 if has_vector_search else 1.0
        if isinstance(root, list):
            return base + sum(cls.node_cost(n) for n in root)
        return base + cls.node_cost(root)

    @classmethod
    def node_cost(cls, node) -> float:
        """explain.rs:314-330 — fixed per-node heuristics."""
        if isinstance(node, VectorSearchPlan):
            return 0.05
        if isinstance(node, FilterPlan):
            return 0.01 * (1.0 - node.selectivity)
        if isinstance(node, (LimitPlan, OffsetPlan)):
            return 0.001
        if isinstance(node, TableScanPlan):
            return 1.0
        if isinstance(node, IndexLookupPlan):
            return 0.0001
        if isinstance(node, list):
            return sum(cls.node_cost(n) for n in node)
        if isinstance(node, MatchTraversalPlan):
            return (0.1 + float(node.max_depth) * 0.05
                    + (0.05 if node.has_similarity else 0.0))
        raise TypeError(f"unknown plan node: {type(node).__name__}")

    # ---------------------------------------------------- rendering
    def to_tree(self) -> str:
        """explain.rs:410-431 — tree text, cost, index, filter strategy."""
        out = ["Query Plan:\n"]
        self.render_node(self.root, out, "", True)
        out.append(f"\nEstimated cost: {self.estimated_cost_ms:.3f}ms\n")
        if self.index_used is not None:
            out.append(f"Index used: {IndexType.as_str(self.index_used)}\n")
        if self.filter_strategy != FilterStrategy.NONE:
            out.append("Filter strategy: "
                       f"{FilterStrategy.as_str(self.filter_strategy)}\n")
        return "".join(out)

    @classmethod
    def render_node(cls, node, out: list, prefix: str, is_last: bool) -> None:
        """explain.rs:433-506 — exact connector/label strings."""
        conn = "└─ " if is_last else "├─ "
        child = prefix + ("   " if is_last else "│  ")
        if isinstance(node, VectorSearchPlan):
            out.append(f"{prefix}{conn}VectorSearch\n")
            out.append(f"{child}├─ Collection: {node.collection}\n")
            out.append(f"{child}├─ ef_search: {node.ef_search}\n")
            out.append(f"{child}└─ Candidates: {node.candidates}\n")
        elif isinstance(node, FilterPlan):
            out.append(f"{prefix}{conn}Filter\n")
            out.append(f"{child}├─ Conditions: {node.conditions}\n")
            out.append(f"{child}└─ Selectivity: {node.selectivity * 100.0:.1f}%\n")
        elif isinstance(node, LimitPlan):
            out.append(f"{prefix}{conn}Limit: {node.count}\n")
        elif isinstance(node, OffsetPlan):
            out.append(f"{prefix}{conn}Offset: {node.count}\n")
        elif isinstance(node, TableScanPlan):
            out.append(f"{prefix}{conn}TableScan: {node.collection}\n")
        elif isinstance(node, IndexLookupPlan):
            out.append(f"{prefix}{conn}IndexLookup({node.label}.{node.property})\n")
            out.append(f"{child}└─ Value: {node.value}\n")
        elif isinstance(node, list):
            for i, c in enumerate(node):
                cls.render_node(c, out, prefix, i == len(node) - 1)
        elif isinstance(node, MatchTraversalPlan):
            out.append(f"{prefix}{conn}MatchTraversal\n")
            out.append(f"{child}├─ Strategy: {node.strategy}\n")
            if node.start_labels:
                out.append(f"{child}├─ Start Labels: "
                           f"[{', '.join(node.start_labels)}]\n")
            out.append(f"{child}├─ Max Depth: {node.max_depth}\n")
            out.append(f"{child}├─ Relationships: {node.relationship_count}\n")
            if node.similarity_threshold is not None:
                out.append(f"{child}└─ Similarity Threshold: "
                           f"{node.similarity_threshold:.2f}\n")
            else:
                out.append(f"{child}└─ Similarity: "
                           f"{'yes' if node.has_similarity else 'no'}\n")
        else:
            raise TypeError(f"unknown plan node: {type(node).__name__}")

    def to_json(self) -> str:
        """explain.rs:513-515 — serde-shaped JSON: every node serializes as
        {"NodeTag": {fields...}} (externally-tagged enum), the plan as
        {root, estimated_cost_ms, index_used, filter_strategy}."""
        return json.dumps({
            "root": _node_json(self.root),
            "estimated_cost_ms": self.estimated_cost_ms,
            "index_used": self.index_used,
            "filter_strategy": self.filter_strategy,
        }, indent=2)

    def __str__(self) -> str:  # Display impl (explain.rs:558-562)
        return self.to_tree()


def _node_json(node):
    if isinstance(node, list):
        return {"Sequence": [_node_json(n) for n in node]}
    return {_node_tag(node): dict(vars(node))}


# ------------------------------------------------------------ ANALYZE

@dataclass
class ActualStats:
    """explain.rs:138-152."""

    actual_rows: int = 0
    actual_time_ms: float = 0.0
    loops: int = 1
    nodes_visited: int = 0
    edges_traversed: int = 0


@dataclass
class ExplainOutput:
    """explain.rs:127-136 — plan plus optional EXPLAIN ANALYZE stats."""

    plan: QueryPlan
    actual_stats: Optional[ActualStats] = None

    def to_json(self) -> str:
        d = {"plan": json.loads(self.plan.to_json())}
        if self.actual_stats is not None:
            d["actual_stats"] = dict(vars(self.actual_stats))
        return json.dumps(d, indent=2)

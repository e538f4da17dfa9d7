"""MATCH query planner: stats-driven execution-strategy choice.

Reference: crates/velesdb-core/src/collection/search/query/match_planner.rs
— ``MatchExecutionStrategy`` (GraphFirst | VectorFirst | Parallel,
:11-50), ``CollectionStats`` for cost estimation (:53-66), the
``plan()`` decision rules (:84-153), ``estimate_top_k`` (:216-234),
``estimate_selectivity`` (:236-241) and ``should_use_parallel``
(:243-257).

Spark-first: the strategy object decides WHERE the similarity predicate
is applied relative to the traversal joins — not how the join itself
runs (Catalyst owns that). GraphFirst keeps similarity as a post-
traversal filter (the translator default); VectorFirst pushes the
threshold filter onto the start-node scan so the traversal only ever
joins the similar frontier; Parallel applies both the label filter and
the similarity prefilter on the start scan (the reference runs both
legs concurrently and merges — with declarative plans the merged
predicate IS that intersection, evaluated in one pass). All strategies
return identical rows: the threshold filter is exact (no top-k
truncation), so the choice is a physical-plan hint, never a semantics
change — property-tested in ``tests/test_match_planner.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from velesdb_spark.velesql import ast


@dataclass(frozen=True)
class PlannerStats:
    """match_planner.rs CollectionStats (:53-66)."""

    total_nodes: int = 0
    total_edges: int = 0
    avg_degree: float = 0.0
    label_count: int = 0
    label_selectivity: float = 1.0

    @classmethod
    def from_graph(cls, nodes: DataFrame, edges: Optional[DataFrame],
                   labels_col: str = "labels") -> "PlannerStats":
        """ONE aggregation per table (count + HLL label cardinality);
        no collect of data rows — the 100 TB stats path."""
        n = int(nodes.agg(F.count(F.lit(1)).alias("_n")).first()._n)
        label_count = 0
        if labels_col in nodes.columns:
            label_count = int(
                nodes.select(F.explode(labels_col).alias("_l"))
                .agg(F.approx_count_distinct("_l").alias("_c"))
                .first()._c)
        m = int(edges.count()) if edges is not None else 0
        return cls(
            total_nodes=n,
            total_edges=m,
            avg_degree=(m / n) if n else 0.0,
            label_count=label_count,
            label_selectivity=(1.0 / label_count) if label_count else 1.0,
        )


@dataclass(frozen=True)
class GraphFirst:
    """Traverse first, filter by similarity after (match_planner.rs:14-21)."""

    start_labels: tuple = ()
    max_depth: int = 1


@dataclass(frozen=True)
class VectorFirst:
    """Similarity-prefilter the start nodes, then traverse (:23-32).
    ``top_k`` is the reference's over-fetch hint; execution here filters
    by threshold (exact), so top_k only annotates EXPLAIN."""

    similarity_alias: str = ""
    top_k: int = 100
    threshold: float = 0.0


@dataclass(frozen=True)
class Parallel:
    """Both legs merged (:34-41)."""

    graph_hint: GraphFirst = field(default_factory=GraphFirst)
    vector_hint: VectorFirst = field(default_factory=VectorFirst)


def has_similarity_condition(cond) -> bool:
    """match_planner.rs:155-170 (recursive similarity() detection)."""
    if cond is None:
        return False
    if isinstance(cond, (ast.And, ast.Or)):
        return any(has_similarity_condition(c) for c in cond.conditions)
    if isinstance(cond, ast.Not):
        return has_similarity_condition(cond.condition)
    return isinstance(cond, ast.Similarity)


def extract_similarity_info(cond, default_alias: str = ""):
    """First similarity() as (alias, threshold, field) — the reference's
    extract_similarity_info (:172-204). A bare field (no dot) binds to
    the LAST pattern node in our MATCH translator, so the default alias
    is the target's, not the start's."""
    if cond is None:
        return None
    if isinstance(cond, (ast.And, ast.Or)):
        for c in cond.conditions:
            info = extract_similarity_info(c, default_alias)
            if info is not None:
                return info
        return None
    if isinstance(cond, ast.Not):
        return extract_similarity_info(cond.condition, default_alias)
    if isinstance(cond, ast.Similarity):
        name = cond.field_name
        if "." in name:
            alias, fld = name.split(".", 1)
        else:
            alias, fld = default_alias, name
        return alias, float(cond.threshold), fld
    return None


def conjunctive_similarities(cond):
    """Similarity conditions reachable through AND nodes only. A
    similarity under OR/NOT cannot be pushed onto the start scan without
    changing results, so the VectorFirst prefilter (and the reference's
    vector-first candidate fetch, match_exec.rs) only applies to
    conjunctive predicates."""
    if cond is None:
        return []
    if isinstance(cond, ast.And):
        out = []
        for c in cond.conditions:
            out.extend(conjunctive_similarities(c))
        return out
    if isinstance(cond, ast.Similarity):
        return [cond]
    return []


def count_hops(q: ast.MatchQuery) -> int:
    """Maximum traversal depth across the pattern (:206-214)."""
    return sum(max(int(r.max_depth), 1) for r in q.rels) if q.rels else 0


def estimate_selectivity(threshold: float) -> float:
    """threshold 0.9 → ~10 % pass (:236-241)."""
    return max(1.0 - float(threshold), 0.01)


def estimate_top_k(q: ast.MatchQuery, stats: PlannerStats,
                   threshold: float) -> int:
    """Over-fetch estimate (:216-234): limit × graph-factor ÷ selectivity,
    clamped to [limit, limit*100]."""
    limit = int(q.limit) if q.limit is not None else 100
    selectivity = estimate_selectivity(threshold)
    if stats.avg_degree > 0.0:
        graph_factor = min(1.0 / max(stats.label_selectivity, 1e-9), 10.0)
    else:
        graph_factor = 2.0
    import math

    estimated = math.ceil(limit * graph_factor / selectivity)
    return max(limit, min(estimated, limit * 100))


def should_use_parallel(stats: PlannerStats, sim_info) -> bool:
    """Large + dense + high threshold (:243-257)."""
    large = stats.total_nodes > 10_000
    dense = stats.avg_degree > 5.0
    high = sim_info is not None and sim_info[1] > 0.8
    return large and dense and high


def plan(q: ast.MatchQuery, stats: PlannerStats):
    """The reference's decision rules verbatim (match_planner.rs:84-153)."""
    aliases = [np.alias or f"_anon{i}" for i, np in enumerate(q.nodes)]
    start_alias = aliases[0] if aliases else ""
    target_alias = aliases[-1] if aliases else ""
    has_sim = has_similarity_condition(q.where)
    sim_info = extract_similarity_info(q.where, default_alias=target_alias)
    sim_on_start = sim_info is not None and sim_info[0] == start_alias
    start_labels = tuple(q.nodes[0].labels) if q.nodes else ()
    max_depth = count_hops(q)

    if has_sim and sim_on_start:
        alias, threshold, _ = sim_info
        return VectorFirst(similarity_alias=alias,
                           top_k=estimate_top_k(q, stats, threshold),
                           threshold=threshold)
    if not has_sim:
        return GraphFirst(start_labels=start_labels, max_depth=max_depth)
    if should_use_parallel(stats, sim_info):
        alias, threshold, _ = sim_info
        return Parallel(
            graph_hint=GraphFirst(start_labels=start_labels,
                                  max_depth=max_depth),
            vector_hint=VectorFirst(
                similarity_alias=alias,
                top_k=estimate_top_k(q, stats, threshold),
                threshold=threshold))
    return GraphFirst(start_labels=start_labels, max_depth=max_depth)


def explain_strategy(strategy) -> str:
    """Human-readable strategy line (match_planner.rs explain())."""
    if isinstance(strategy, VectorFirst):
        return (f"VectorFirst(alias={strategy.similarity_alias}, "
                f"top_k={strategy.top_k}, "
                f"threshold={strategy.threshold:.2f})")
    if isinstance(strategy, Parallel):
        return (f"Parallel(graph={explain_strategy(strategy.graph_hint)}, "
                f"vector={explain_strategy(strategy.vector_hint)})")
    labels = ",".join(strategy.start_labels) or "*"
    return f"GraphFirst(labels={labels}, max_depth={strategy.max_depth})"

"""Translation-level EXPLAIN plan tree.

Reference: velesql/explain.rs:38-177 — a plan tree over node types
``VectorSearch | Filter | Limit | Offset | TableScan | IndexLookup |
Sequence | MatchTraversal`` with estimated costs, index type, and pre/post
filter strategy. Catalyst owns the real physical plan; this tree is the
VelesQL-level view (what the reference's `/query/explain` endpoint returns),
emitted alongside `df.explain` by `Collection.explain`.

Costs are unitless heuristics (scan = rows-ish 1.0 baseline), matching the
reference's spirit (cost_model.rs) without pretending to its calibration.
"""

from __future__ import annotations

from velesdb_spark.velesql import ast


def _walk_cond(cond, nodes: list[str], qmode=None, oversampling=4) -> None:
    if cond is None:
        return
    if isinstance(cond, (ast.And, ast.Or)):
        for c in cond.conditions:
            _walk_cond(c, nodes, qmode, oversampling)
        return
    if isinstance(cond, ast.Not):
        _walk_cond(cond.condition, nodes, qmode, oversampling)
        return
    if isinstance(cond, ast.VectorSearch):
        if qmode == "dual":
            # two-phase WITH (quantization='dual') — coarse SQ8 pool then
            # exact re-rank (dual_precision.rs search_int8_traversal)
            nodes.append(
                f"VectorSearch(quantization=dual, phase1=sq8 "
                f"pool=k*{oversampling}, phase2=f32 rerank, cost=0.40)")
        elif qmode == "int8":
            nodes.append(
                "VectorSearch(quantization=int8, approximate=true, "
                "cost=0.30)")
        else:
            nodes.append(
                "VectorSearch(metric=collection, exact=true, cost=1.00)")
        return
    if isinstance(cond, ast.VectorFusedSearch):
        n = len(cond.vectors)
        strat = (cond.fusion.strategy if cond.fusion else "average")
        nodes.append(
            f"VectorSearch(fused={n}, strategy={strat}, exact=true, cost={1.0 * n:.2f})")
        return
    if isinstance(cond, ast.Similarity):
        nodes.append(
            f"Filter(similarity {cond.op} {cond.threshold}, exact=true, cost=0.10)")
        return
    if isinstance(cond, ast.MatchText):
        nodes.append(f"IndexLookup(bm25, column={cond.column}, cost=0.50)")
        return
    nodes.append("Filter(predicate, pushdown=parquet, cost=0.10)")


def plan_tree(q) -> str:
    """Render the reference-shaped plan for a parsed VelesQL query."""
    while isinstance(q, ast.Explain):  # EXPLAIN [EXPLAIN ...] <q>
        q = q.query
    if isinstance(q, ast.MatchQuery):
        hops = len(q.rels)
        var = any(r.max_depth > 1 or r.max_depth > r.min_depth for r in q.rels)
        # strategy choice mirrors match_planner.rs:84-153
        strat = "VectorFirst" if _has_similarity(q.where) else "GraphFirst"
        return ("MatchTraversal(patterns={}, hops={}, var_length={}, "
                "strategy={}, cost={:.2f})".format(
                    len(q.nodes), hops, str(var).lower(), strat,
                    1.0 + 0.5 * hops))
    if isinstance(q, ast.Compound):
        return ("Sequence(setop={})\n  {}\n  {}".format(
            q.op, plan_tree(q.left).replace("\n", "\n  "),
            plan_tree(q.right).replace("\n", "\n  ")))
    s = q
    from velesdb_spark.functions.quantization import (
        DUAL_DEFAULT_OVERSAMPLING, parse_quantization_mode)

    wo = getattr(s, "with_options", {}) or {}
    qmode = parse_quantization_mode(wo.get("quantization"))
    try:
        osamp = max(int(wo.get("oversampling", DUAL_DEFAULT_OVERSAMPLING)), 1)
    except (TypeError, ValueError):
        osamp = DUAL_DEFAULT_OVERSAMPLING
    nodes: list[str] = [f"TableScan({s.table}, columnar=parquet, cost=1.00)"]
    _walk_cond(s.where, nodes, qmode, osamp)
    if s.group_by or _has_aggregates(s):
        nodes.append("Sequence(aggregate, partial+final, cost=0.30)")
    if s.order_by:
        nodes.append("Sequence(sort, top-k when limited, cost=0.20)")
    if s.offset:
        nodes.append(f"Offset({s.offset})")
    if s.limit is not None:
        nodes.append(f"Limit({s.limit})")
    out = []
    for i, n in enumerate(nodes):
        out.append(("  " * i) + ("-> " if i else "") + n)
    return "\n".join(out)


def _has_similarity(cond) -> bool:
    if cond is None:
        return False
    if isinstance(cond, (ast.And, ast.Or)):
        return any(_has_similarity(c) for c in cond.conditions)
    if isinstance(cond, ast.Not):
        return _has_similarity(cond.condition)
    return isinstance(cond, ast.Similarity)


def _has_aggregates(s) -> bool:
    return any(isinstance(c, ast.Aggregate) for c in getattr(s, "columns", ()))

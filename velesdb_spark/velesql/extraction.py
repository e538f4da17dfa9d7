"""Query-condition extraction — parity with the reference's
``collection/search/query/extraction.rs`` (the prefilter planner's
helpers, tested by extraction_tests.rs).

The translator executes the FULL condition exactly, so these helpers are
not needed for correctness here; they exist as the planning surface the
reference exposes: ``extract_match_query`` pulls the first MATCH text
out of a conjunction (the BM25 leg of a hybrid query), and
``extract_metadata_filter`` strips vector conditions to produce the
pushdown-safe metadata residue. The AND/OR asymmetry is deliberate and
mirrored exactly (extraction.rs:157-199 FLAG-13): under AND a partial
residue is still a valid prefilter (the vector side is handled
separately), but an OR with a vector side is NOT evaluable from
metadata alone — the whole disjunction must be dropped (returns None),
otherwise the prefilter would WRONGLY exclude rows the vector side
admits.

Python ASTs use n-ary And/Or (tuples of conditions); the binary
reference semantics extend naturally: AND keeps every extractable
side, OR requires every side to be extractable.
"""

from __future__ import annotations

from typing import Optional

from velesdb_spark.velesql import ast


def extract_match_query(cond) -> Optional[str]:
    """First MATCH text predicate in the conjunctive structure
    (extraction.rs:12-21): Match → its query; And → first hit,
    left-to-right; anything else → None (OR'd MATCH is not a pure
    text leg)."""
    if isinstance(cond, ast.MatchText):
        return cond.query
    if isinstance(cond, ast.And):
        for c in cond.conditions:
            q = extract_match_query(c)
            if q is not None:
                return q
    return None


def extract_metadata_filter(cond):
    """Strip vector conditions (similarity / NEAR / NEAR_FUSED) and
    return the metadata-only residue, or None when nothing evaluable
    remains (extraction.rs:157-199):

    - AND keeps the extractable sides (one side alone is fine);
    - OR requires EVERY side (a half-evaluable OR would wrongly
      prefilter rows the vector side admits);
    - NOT survives only if its inner condition survives;
    - a single-child And/Or unwraps to the child (the reference's
      Group unwrap).
    """
    if isinstance(cond, (ast.Similarity, ast.VectorSearch,
                         ast.VectorFusedSearch)):
        return None
    if isinstance(cond, ast.And):
        kept = [r for r in (extract_metadata_filter(c)
                            for c in cond.conditions) if r is not None]
        if not kept:
            return None
        return kept[0] if len(kept) == 1 else ast.And(tuple(kept))
    if isinstance(cond, ast.Or):
        kept = [extract_metadata_filter(c) for c in cond.conditions]
        if any(r is None for r in kept):
            return None
        return kept[0] if len(kept) == 1 else ast.Or(tuple(kept))
    if isinstance(cond, ast.Not):
        inner = extract_metadata_filter(cond.condition)
        return None if inner is None else ast.Not(inner)
    return cond

"""VelesQL query validation — reference-compat limit gating.

Reference: crates/velesdb-core/src/velesql/validation.rs — error codes
V001–V005 with positions, ``ValidationConfig`` strict/lenient, and the
one rule still active after the EPIC-044 relaxations: multiple vector
searches combined under OR (V001) are rejected because the reference's
HNSW executor cannot union vector searches (validation.rs:232-245,
has_multiple_similarity_in_or :309-330). similarity() OR metadata
(US-002) and NOT similarity() (US-003) validate cleanly.

This engine EXECUTES every one of those shapes exactly (the
`similarity_or_metadata` / `not_similarity` / cascade entries are all
oracle-gated; an OR of similarities is just a disjunctive filter over
exact scores). The validator exists as a compatibility surface: an
application migrating from the reference can keep its pre-flight
validation behavior — including the exact error codes and messages —
while deciding per call site whether to lift the limits.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from velesdb_spark.velesql import ast


class ValidationError(Exception):
    """validation.rs ValidationError: kind code + message + offending
    query fragment + optional position."""

    def __init__(self, kind: str, message: str, fragment: str = "",
                 position: Optional[int] = None):
        self.kind = kind
        self.message = message
        self.fragment = fragment
        self.position = position
        loc = f" at position {position}" if position is not None else ""
        frag = f" (in: {fragment})" if fragment else ""
        super().__init__(f"[{kind}] {message}{loc}{frag}")


# validation.rs ValidationErrorKind::code()/message()
KIND_CODES = {
    "multiple_similarity": "V001",
    "similarity_with_or": "V002",
    "not_similarity": "V003",
    "reserved_keyword": "V004",
    "string_escaping": "V005",
}
KIND_MESSAGES = {
    "V001": "Multiple similarity() conditions not supported",
    "V002": "OR operator not supported with similarity()",
    "V003": "NOT similarity() requires full scan",
    "V004": "Reserved keyword requires escaping",
    "V005": "Invalid string escaping",
}


def multiple_similarity_error(fragment: str = "") -> ValidationError:
    return ValidationError("V001", KIND_MESSAGES["V001"], fragment)


def similarity_with_or_error(fragment: str = "") -> ValidationError:
    return ValidationError("V002", KIND_MESSAGES["V002"], fragment)


def not_similarity_error(fragment: str = "") -> ValidationError:
    return ValidationError("V003", KIND_MESSAGES["V003"], fragment)


@dataclass(frozen=True)
class ValidationConfig:
    """validation.rs ValidationConfig (:156-188)."""

    strict_not_similarity: bool = True

    @classmethod
    def strict(cls) -> "ValidationConfig":
        return cls(strict_not_similarity=True)

    @classmethod
    def lenient(cls) -> "ValidationConfig":
        return cls(strict_not_similarity=False)


def _is_vector_cond(c) -> bool:
    # Similarity + VectorSearch (NEAR) + VectorFusedSearch (NEAR_FUSED),
    # validation.rs:260-273
    return isinstance(c, (ast.Similarity, ast.VectorSearch,
                          ast.VectorFusedSearch))


def count_similarity_conditions(c) -> int:
    if c is None:
        return 0
    if _is_vector_cond(c):
        return 1
    if isinstance(c, (ast.And, ast.Or)):
        return sum(count_similarity_conditions(x) for x in c.conditions)
    if isinstance(c, ast.Not):
        return count_similarity_conditions(c.condition)
    return 0


def contains_similarity(c) -> bool:
    return count_similarity_conditions(c) > 0


def has_not_similarity(c) -> bool:
    if c is None:
        return False
    if isinstance(c, ast.Not):
        return contains_similarity(c.condition)
    if isinstance(c, (ast.And, ast.Or)):
        return any(has_not_similarity(x) for x in c.conditions)
    return False


def has_multiple_similarity_in_or(c) -> bool:
    """validation.rs:309-330 — ≥2 OR branches each containing a vector
    search means a union of vector searches (the reference can't; we
    can, but the strict validator still flags it). Our OR is n-ary,
    the reference's binary — 'both sides' generalizes to 'more than one
    branch'."""
    if c is None:
        return False
    if isinstance(c, ast.Or):
        with_sim = sum(
            1 for x in c.conditions if count_similarity_conditions(x) > 0)
        if with_sim > 1:
            return True
        return any(has_multiple_similarity_in_or(x) for x in c.conditions)
    if isinstance(c, ast.And):
        return any(has_multiple_similarity_in_or(x) for x in c.conditions)
    if isinstance(c, ast.Not):
        return has_multiple_similarity_in_or(c.condition)
    return False


class QueryValidator:
    """validation.rs QueryValidator: validate() / validate_with_config().

    Accepts a parsed query (ast.Select / ast.Compound / ast.Explain) or a
    VelesQL string."""

    @staticmethod
    def validate(query) -> None:
        QueryValidator.validate_with_config(query, ValidationConfig())

    @staticmethod
    def validate_with_config(query, config: ValidationConfig) -> None:
        if isinstance(query, str):
            from velesdb_spark.velesql.parser import parse

            query = parse(query)
        while isinstance(query, ast.Explain):
            query = query.query
        if isinstance(query, ast.MatchQuery):
            return  # the reference validates SELECT trees only
        selects = []
        if isinstance(query, ast.Compound):
            selects = [query.left, query.right]
        elif isinstance(query, ast.Select):
            selects = [query]
        for sel in selects:
            QueryValidator._validate_condition(sel.where, sel.limit, config)

    @staticmethod
    def _validate_condition(cond, limit, config: ValidationConfig) -> None:
        # EPIC-044 US-001: multiple similarity in AND = cascade (allowed);
        # under one OR = union of vector searches (V001 in the reference;
        # this engine executes it — the validator is compat gating).
        # NB: the remediation prose IS the reference's fragment argument
        # (validation.rs:242-245 passes it to multiple_similarity()).
        if (count_similarity_conditions(cond) > 1
                and has_multiple_similarity_in_or(cond)):
            raise multiple_similarity_error(
                "Multiple similarity() in OR are not supported. "
                "Use AND instead.")
        # US-002: similarity OR metadata validates cleanly (union mode).
        # US-003: NOT similarity() executes via full scan; the
        # strict_not_similarity flag gates the pre-relaxation V003 rule —
        # NOT similarity with no LIMIT is an unbounded full scan, which a
        # strict deployment can still refuse. (The reference's current
        # validate_condition ignores its config — the flag's documented
        # contract, validation.rs:158-161, is what we wire here; lenient
        # reproduces the reference's effective always-pass behavior.)
        if (config.strict_not_similarity and limit is None
                and has_not_similarity(cond)):
            raise not_similarity_error(
                "NOT similarity() without LIMIT requires an unbounded "
                "full scan. Add a LIMIT or use lenient validation.")

"""Typed VelesQL error-code surface — parity with the reference's
``velesql/error.rs`` (codes asserted in error_tests.rs:36-43):

    E001 SyntaxError          E004 DimensionMismatch
    E002 UnknownColumn        E005 MissingParameter
    E003 CollectionNotFound   E006 TypeMismatch

Applications porting from the reference catch errors by kind/code, so
both exception classes (VelesQLSyntaxError from the lexer/parser,
TranslationError from the translator) carry ``kind`` / ``code`` /
``position`` / ``fragment`` attributes and render them in str() the way
error.rs Display does ("[E001] ... at position 15 near 'FORM'").
"""

from __future__ import annotations

SYNTAX_ERROR = "SyntaxError"
UNKNOWN_COLUMN = "UnknownColumn"
COLLECTION_NOT_FOUND = "CollectionNotFound"
DIMENSION_MISMATCH = "DimensionMismatch"
MISSING_PARAMETER = "MissingParameter"
TYPE_MISMATCH = "TypeMismatch"

#: error.rs ParseErrorKind::code()
CODES = {
    SYNTAX_ERROR: "E001",
    UNKNOWN_COLUMN: "E002",
    COLLECTION_NOT_FOUND: "E003",
    DIMENSION_MISMATCH: "E004",
    MISSING_PARAMETER: "E005",
    TYPE_MISMATCH: "E006",
}


class VelesQLErrorMixin:
    """Attach (kind, code, position, fragment) to an exception class.

    ``kind`` is optional: untagged raises keep their plain message (the
    reference's ValidationError hierarchy has kinds of its own that do
    not map 1:1 onto ParseErrorKind, so only the unambiguous sites are
    tagged). Tagged errors render "[Exxx] message at position N near
    'frag'" the way error.rs Display does."""

    kind: str | None = None
    position: int | None = None
    fragment: str | None = None

    def _init_error(self, message: str, kind: str | None = None,
                    position: int | None = None,
                    fragment: str | None = None) -> str:
        self.kind = kind if kind is not None else type(self).kind
        self.position = position
        self.fragment = fragment
        parts = [message if self.code is None
                 else f"[{self.code}] {message}"]
        if position is not None:
            parts.append(f"at position {position}")
        if fragment:
            parts.append(f"near {fragment!r}")
        return " ".join(parts)

    @property
    def code(self) -> str | None:
        return CODES.get(self.kind) if self.kind else None

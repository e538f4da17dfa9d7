"""VelesQL tokenizer.

Token classes follow the reference grammar's terminals
(grammar.pest: string/integer/float/identifier/quoted_identifier/parameter,
'--' line comments, case-insensitive keywords).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from velesdb_spark.velesql.errors import SYNTAX_ERROR, VelesQLErrorMixin


class VelesQLSyntaxError(VelesQLErrorMixin, ValueError):
    """Parse/lex failure; carries the E001 SyntaxError code
    (error.rs ParseErrorKind) plus optional position/fragment."""

    kind = SYNTAX_ERROR

    def __init__(self, message, kind=None, position=None, fragment=None):
        super().__init__(self._init_error(message, kind, position,
                                          fragment))


@dataclass(frozen=True)
class Token:
    kind: str  # KW, IDENT, QIDENT, INT, FLOAT, STRING, PARAM, OP, PUNCT, EOF
    value: str
    pos: int


KEYWORDS = {
    "SELECT", "DISTINCT", "FROM", "AS", "WHERE", "AND", "OR", "NOT", "IN",
    "BETWEEN", "LIKE", "ILIKE", "IS", "NULL", "TRUE", "FALSE", "GROUP", "BY",
    "HAVING", "ORDER", "LIMIT", "OFFSET", "JOIN", "INNER", "LEFT", "RIGHT",
    "FULL", "OUTER", "ON", "USING", "UNION", "ALL", "INTERSECT", "EXCEPT",
    "COUNT", "SUM", "AVG", "MIN", "MAX", "NEAR", "NEAR_FUSED", "MATCH",
    "RETURN", "WITH", "FUSION", "NOW", "INTERVAL", "ASC", "DESC", "SIMILARITY",
    "EXPLAIN", "ANALYZE", "EXISTS",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|--[^\n]*)
  | (?P<float>-?\d+\.\d+)
  | (?P<int>-?\d+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<backtick>`[^`]+`)
  | (?P<dquote>"(?:[^"]|"")*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=|>=|<>|!=|<-|->|\.\.|[=<>+*/])
  | (?P<punct>[(),\[\]{}.:;|\-])
    """,
    re.VERBOSE,
)


def tokenize(sql: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    n = len(sql)
    while pos < n:
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise VelesQLSyntaxError(f"unexpected character {sql[pos]!r} at {pos}")
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            pass
        elif kind == "float":
            tokens.append(Token("FLOAT", text, pos))
        elif kind == "int":
            tokens.append(Token("INT", text, pos))
        elif kind == "string":
            # '' escapes a quote inside the literal (VELESQL_SPEC.md
            # "String Escaping"; backslash escaping is NOT supported)
            tokens.append(Token("STRING", text[1:-1].replace("''", "'"),
                                pos))
        elif kind == "param":
            tokens.append(Token("PARAM", text[1:], pos))
        elif kind == "backtick":
            tokens.append(Token("QIDENT", text[1:-1], pos))
        elif kind == "dquote":
            tokens.append(Token("QIDENT", text[1:-1].replace('""', '"'), pos))
        elif kind == "ident":
            up = text.upper()
            if up in KEYWORDS:
                tokens.append(Token("KW", up, pos))
            else:
                tokens.append(Token("IDENT", text, pos))
        elif kind == "op":
            tokens.append(Token("OP", text, pos))
        else:
            tokens.append(Token("PUNCT", text, pos))
        pos = m.end()
    tokens.append(Token("EOF", "", n))
    return tokens

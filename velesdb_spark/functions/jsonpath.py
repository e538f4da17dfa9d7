"""JSON path parsing and extraction — parity with the reference's
``velesql/json_path.rs`` (EPIC-052 US-005: dot notation plus array
indexing for nested-field access), extended with a Spark column compiler.

The reference type is driver-side (parse → segments → extract over a
serde_json Value). This module keeps that surface byte-compatible
(parse errors, ``extract``/``extract_or_null`` miss semantics,
``root_property``/``tail``/``str()`` round-trip — json_path_tests.rs, all
19 shapes in tests/test_jsonpath.py) and adds the piece Spark needs:
``to_column`` compiles a path onto a JSON-text column as ONE
``get_json_object`` call ($.a[0].b JSONPath), so extraction over a
100 TB corpus is a single JVM-side expression per row — no Python, no
per-segment intermediate columns.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F


class JsonPathError(ValueError):
    """json_path.rs:9-33 — base class; the four variants are subclasses."""


class EmptyPath(JsonPathError):
    def __init__(self):
        super().__init__("Empty JSON path")


class InvalidArrayIndex(JsonPathError):
    def __init__(self, s: str):
        super().__init__(f"Invalid array index: '{s}'")
        self.index_text = s


class UnclosedBracket(JsonPathError):
    def __init__(self):
        super().__init__("Unclosed bracket in JSON path")


class EmptySegment(JsonPathError):
    def __init__(self):
        super().__init__("Empty segment in JSON path (double dot)")


#: Segments are plain Python values: a ``str`` is a Property, an ``int``
#: is an Index (json_path.rs PathSegment).
Segment = Any


class JsonPath:
    """Parsed JSON path (json_path.rs:57-224)."""

    __slots__ = ("segments",)

    def __init__(self, segments: Optional[list] = None):
        self.segments = list(segments or [])

    # ------------------------------------------------------ construction
    @classmethod
    def from_property(cls, name: str) -> "JsonPath":
        return cls([name])

    @classmethod
    def parse(cls, text: str) -> "JsonPath":
        """json_path.rs:85-149 — char-walk parse with the reference's
        exact error taxonomy (a dot straight after ``[i]`` is a plain
        separator, a leading index ``[0].x`` is legal, ``a..b`` is an
        EmptySegment, ``items[0`` an UnclosedBracket, ``items[abc]`` an
        InvalidArrayIndex)."""
        text = text.strip()
        if not text:
            raise EmptyPath()
        segments: list = []
        current = ""
        i = 0
        last_was_index = False
        while i < len(text):
            c = text[i]
            if c == ".":
                if not current and not last_was_index and segments:
                    raise EmptySegment()
                if current:
                    segments.append(current)
                    current = ""
                last_was_index = False
            elif c == "[":
                if current:
                    segments.append(current)
                    current = ""
                end = text.find("]", i + 1)
                if end < 0:
                    raise UnclosedBracket()
                idx_str = text[i + 1:end]
                stripped = idx_str.strip()
                # usize::parse: non-negative decimal digits only
                if not stripped.isdigit():
                    raise InvalidArrayIndex(idx_str)
                segments.append(int(stripped))
                last_was_index = True
                i = end
            else:
                current += c
                last_was_index = False
            i += 1
        if current:
            segments.append(current)
        if not segments:
            raise EmptyPath()
        return cls(segments)

    # ------------------------------------------------------ inspection
    def is_simple(self) -> bool:
        return len(self.segments) == 1 and isinstance(self.segments[0], str)

    def root_property(self) -> Optional[str]:
        if self.segments and isinstance(self.segments[0], str):
            return self.segments[0]
        return None

    def tail(self) -> "JsonPath":
        return JsonPath(self.segments[1:])

    # ------------------------------------------------------ extraction
    def extract(self, doc):
        """Walk the parsed document; None on any miss (json_path.rs:178-189
        — a Property against a non-object or an Index against a non-array
        is a miss, never an error)."""
        cur = doc
        for seg in self.segments:
            if isinstance(seg, str):
                if not isinstance(cur, dict) or seg not in cur:
                    return None
                cur = cur[seg]
            else:
                if not isinstance(cur, list) or seg >= len(cur):
                    return None
                cur = cur[seg]
        return cur

    def extract_or_null(self, doc):
        v = self.extract(doc)
        return None if v is None else v

    # ------------------------------------------------------ Spark column
    def to_jsonpath(self) -> str:
        """The $-rooted JSONPath string Spark's get_json_object (and
        DuckDB's json_extract) understand."""
        out = "$"
        for seg in self.segments:
            out += f"[{seg}]" if isinstance(seg, int) else f".{seg}"
        return out

    def to_column(self, js: Column | str) -> Column:
        """Compile onto a JSON-text column: one get_json_object call,
        whole-stage-codegen-friendly, NULL on any path miss (matching
        extract's miss semantics)."""
        col = F.col(js) if isinstance(js, str) else js
        return F.get_json_object(col, self.to_jsonpath())

    # ------------------------------------------------------ protocol
    def __str__(self) -> str:
        """json_path.rs:204-224 — display round-trips parse."""
        out = ""
        for i, seg in enumerate(self.segments):
            if isinstance(seg, int):
                out += f"[{seg}]"
            elif i == 0:
                out += seg
            else:
                out += f".{seg}"
        return out

    def __repr__(self) -> str:
        return f"JsonPath({self.segments!r})"

    def __eq__(self, other) -> bool:
        return isinstance(other, JsonPath) and self.segments == other.segments

    def __hash__(self) -> int:
        return hash(tuple(self.segments))

    # serde round-trip (json_path_tests.rs:180-185)
    def to_json(self) -> str:
        return json.dumps({"segments": [
            {"Index": s} if isinstance(s, int) else {"Property": s}
            for s in self.segments]})

    @classmethod
    def from_json(cls, text: str) -> "JsonPath":
        segs = []
        for s in json.loads(text)["segments"]:
            if "Index" in s:
                segs.append(int(s["Index"]))
            else:
                segs.append(s["Property"])
        return cls(segs)

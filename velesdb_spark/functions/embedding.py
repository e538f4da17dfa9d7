"""Deterministic md5-derived text embeddings — the engine's stand-in
embedder for environments without a model (reference: demos/rag-pdf-demo
rag_engine.py:105-186 embeds with a real model; the container has none,
so the demo + oracle-gated RAG queries use this reproducible surrogate).

ONE implementation, three views that must stay bit-identical:

- ``md5_embed_expr``  — Spark Column expression (JVM md5, whole-stage
  codegen; embeds a whole corpus column without leaving the executor)
- ``md5_embed_text``  — driver-side Python twin for query strings
- the DuckDB oracle fragment in ``__spark_entry__.oracle_sql()``'s
  rag_retrieval entry re-derives the same formula

Formula: e_j = uint32(md5(text ':' j)[:8]) / (2^32 - 1) * 2 - 1 for
j in 0..dim-1. Swap for a real model via pandas_udf without touching
callers (examples/rag_pipeline.py shows the seam).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_U32_MAX = 4294967295.0


def md5_embed_expr(col: Column, dim: int) -> Column:
    """array<double> embedding of a string column, entirely JVM-side."""
    parts = []
    for j in range(dim):
        h = F.conv(F.substring(F.md5(F.concat(col, F.lit(f":{j}"))),
                               1, 8), 16, 10).cast("double")
        parts.append(h / F.lit(_U32_MAX) * 2.0 - 1.0)
    return F.array(*parts)


def md5_embed_text(text: str, dim: int) -> list[float]:
    """Driver-side twin of md5_embed_expr — same bytes, same floats."""
    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"{text}:{j}".encode()).hexdigest()[:8], 16)
        out.append(h / _U32_MAX * 2.0 - 1.0)
    return out

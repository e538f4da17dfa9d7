"""Trigram similarity: LIKE acceleration stand-in + Jaccard-ranked fuzzy
search.

Reference: index/trigram/index.rs:34-326 — a trigram inverted index that
accelerates LIKE and provides `search_like_ranked` (Jaccard similarity of
character-trigram sets, ranked descending). In Spark the LIKE-acceleration
role is unnecessary (predicate scans scale), so this module provides the
fuzzy-ranked surface: the trigram set is a JVM array expression, the score
is set-Jaccard against the query's trigram set.

Scale: trigram extraction is per-row (no shuffle); ranked search is a scan +
TakeOrderedAndProject. For repeated fuzzy search at 100 TB, materialize
(id, trigram) via explode and bucket by trigram — same postings design as
BM25 (functions/bm25.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def trigram_set(col: Column) -> Column:
    """Distinct character 3-grams of the lowercased string (JVM-side)."""
    s = F.lower(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - 2, F.lit(0))),
        lambda i: F.substring(s, i, F.lit(3)),
    )
    # strings shorter than 3 chars have NO trigrams; without this guard
    # sequence(1, 0) yields a descending [1, 0] and emits junk sub-grams
    return F.when(F.length(s) < 3, F.array().cast("array<string>")) \
        .otherwise(F.array_distinct(grams))


def trigram_jaccard(a: Column, b: Column, distinct_inputs: bool = False) -> Column:
    """Set Jaccard of two trigram arrays; 0 when union is empty.

    ``distinct_inputs=True`` (both arrays already deduplicated, as
    trigram_set guarantees) computes |A∪B| = |A| + |B| − |A∩B| instead of
    materializing array_union — array_union is a second O(|A|·|B|)-ish
    nested-loop pass per row and dominated the fuzzy-search scan at sf1
    (105 s → 35 s for 50k docs × ~300 trigrams, identical scores)."""
    inter = F.size(F.array_intersect(a, b))
    if distinct_inputs:
        uni = F.size(a) + F.size(b) - inter
    else:
        uni = F.size(F.array_union(a, b))
    return F.when(uni > 0, inter.cast("double") / uni.cast("double")) \
        .otherwise(F.lit(0.0))


def _py_trigrams(text: str) -> list[str]:
    s = text.lower()
    return sorted({s[i:i + 3] for i in range(max(len(s) - 2, 0))})


def search_like_ranked(df: DataFrame, query: str, k: int = 10,
                       text_col: str = "text", id_col: str = "id",
                       min_similarity: float = 0.0) -> DataFrame:
    """Fuzzy ranked search (trigram/index.rs search_like_ranked): rank rows
    by Jaccard(trigrams(text), trigrams(query)) descending → (id, score)."""
    from velesdb_spark.functions.util import spread

    q = _py_trigrams(query)
    qarr = F.array(*[F.lit(g) for g in q]) if q else F.array().cast("array<string>")
    # Two plan fences matter here (round 10, measured 76 s → ~3 s at sf1):
    # - spread(): trigram extraction is the expensive per-row stage; a
    #   single-file input would otherwise run it on the file's 1-2
    #   splits while 30 cores idle.
    # - + rand()*0.0: bit-exact no-op that marks the score expression
    #   nondeterministic, which (a) stops the filter from being pushed
    #   BELOW the repartition exchange with a full inlined copy of the
    #   score expression — that copy ran on the pre-shuffle 1-2
    #   partitions and serialized the whole query — and (b) stops
    #   CollapseProject/alias substitution from duplicating the
    #   expression into the filter and sort, where fresh lambda-variable
    #   ids defeat common-subexpression elimination (HOF expressions are
    #   never CSE-equal across copies). One evaluation per row, after
    #   the shuffle, filter and top-k read the materialized attribute.
    score = (trigram_jaccard(trigram_set(F.col(text_col)), qarr,
                             distinct_inputs=True)
             + F.rand() * F.lit(0.0))
    scored = spread(df).select(
        F.col(id_col), score.alias("score"),
    ).filter(F.col("score") > min_similarity)
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)

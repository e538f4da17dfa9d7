"""Score fusion as DataFrame aggregations.

Reference formulations (they differ — both are reproduced):
- Hybrid search RRF (collection/search/text.rs:150-162):
  score = weight/(rank + 60) with 0-based ranks over each ranked list.
- fuse_rrf (velesql/hybrid.rs:112-149) and multi-query RRF
  (fusion/strategy.rs:223-250): score = Σ 1/(k + rank+1), 0-based rank,
  k default 60.
- Multi-query strategies (fusion/strategy.rs:150-300): Average (per-query
  best, then mean), Maximum, Weighted (avg_w·avg + max_w·max + hit_w·hits/Q).

Scale design: inputs are long-format DataFrames (qid, id, score); ranks are
window functions partitioned by qid (one shuffle on qid — small, since these
are per-query top-k lists); fusion itself is a groupBy(id) partial-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from velesdb_spark.functions.arraylit import double_array_lit

RRF_K = 60


def _idents(*names: str) -> bool:
    import re

    return all(re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n) for n in names)


def with_rank(results: DataFrame, qid_col: str = "qid", id_col: str = "id",
              score_col: str = "score", higher_is_better: bool = True) -> DataFrame:
    """0-based rank per query list, score-ordered, id tie-break (deterministic
    stand-in for the reference's insertion order)."""
    if _idents(qid_col, id_col, score_col):
        # one-shot SQL fast path (guide §5): one parse round-trip builds
        # the same window tree (DESC is NULLS LAST / ASC NULLS FIRST by
        # default, matching F.desc/F.asc); rank is an int — no FP concerns
        direction = "DESC" if higher_is_better else "ASC"
        return results.selectExpr(
            "*",
            f"(row_number() OVER (PARTITION BY {qid_col} ORDER BY "
            f"{score_col} {direction}, {id_col} ASC) - 1) AS _rank")
    order = [F.desc(score_col) if higher_is_better else F.asc(score_col), F.asc(id_col)]
    w = Window.partitionBy(qid_col).orderBy(*order)
    return results.withColumn("_rank", F.row_number().over(w) - 1)


def fuse_rrf(results: DataFrame, k: int = RRF_K, qid_col: str = "qid",
             id_col: str = "id", score_col: str = "score",
             higher_is_better: bool = True) -> DataFrame:
    """Multi-list RRF: Σ 1/(k + rank+1) (strategy.rs:223-250, hybrid.rs:112-149)."""
    ranked = with_rank(results, qid_col, id_col, score_col, higher_is_better)
    if _idents(id_col):
        # same tree as the Column form: ((k + _rank) + 1.0), summed
        return ranked.groupBy(id_col).agg(F.expr(
            f"sum(1.0D / ({float(k)!r}D + _rank + 1.0D)) AS score"))
    return (
        ranked.groupBy(id_col)
        .agg(F.sum(1.0 / (F.lit(float(k)) + F.col("_rank") + 1.0)).alias("score"))
    )


def fuse_hybrid_rrf(results: DataFrame, weights: dict | None = None,
                    qid_col: str = "qid", id_col: str = "id",
                    score_col: str = "score") -> DataFrame:
    """Hybrid-search RRF: Σ weight_q/(rank + 60), 0-based rank
    (text.rs:150-162). ``weights`` maps qid → weight (default 1.0)."""
    ranked = with_rank(results, qid_col, id_col, score_col, True)
    if not weights and _idents(id_col):
        # unweighted fast path: wcol folds to 1.0 — same tree, one parse
        return (ranked
                .withColumn("_rrf",
                            F.expr(f"1.0D / (_rank + {float(RRF_K)!r}D)"))
                .groupBy(id_col)
                .agg(F.expr("sum(_rrf) AS score")))
    if weights:
        wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
        wcol = F.coalesce(wmap[F.col(qid_col)], F.lit(1.0))
    else:
        wcol = F.lit(1.0)
    return (
        ranked.withColumn("_rrf", wcol / (F.col("_rank") + float(RRF_K)))
        .groupBy(id_col)
        .agg(F.sum("_rrf").alias("score"))
    )


def fuse_average(results: DataFrame, qid_col: str = "qid", id_col: str = "id",
                 score_col: str = "score") -> DataFrame:
    """Per-query best score, then mean across queries (strategy.rs:169-202)."""
    best = results.groupBy(qid_col, id_col).agg(F.max(score_col).alias("_s"))
    return best.groupBy(id_col).agg(F.avg("_s").alias("score"))


def fuse_maximum(results: DataFrame, qid_col: str = "qid", id_col: str = "id",
                 score_col: str = "score") -> DataFrame:
    """Best score anywhere (strategy.rs:204-221)."""
    return results.groupBy(id_col).agg(F.max(score_col).alias("score"))


def fuse_weighted(results: DataFrame, avg_weight: float, max_weight: float,
                  hit_weight: float, total_queries: int, qid_col: str = "qid",
                  id_col: str = "id", score_col: str = "score") -> DataFrame:
    """avg_w·avg + max_w·max + hit_w·(hits/Q) (strategy.rs:252-300)."""
    s = avg_weight + max_weight + hit_weight
    if avg_weight < 0 or max_weight < 0 or hit_weight < 0 or abs(s - 1.0) > 0.001:
        raise ValueError("fusion weights must be non-negative and sum to 1.0")
    best = results.groupBy(qid_col, id_col).agg(F.max(score_col).alias("_s"))
    return best.groupBy(id_col).agg(
        (
            avg_weight * F.avg("_s")
            + max_weight * F.max("_s")
            + hit_weight * (F.count("*") / float(total_queries))
        ).alias("score")
    )


def fuse_minimum(results: DataFrame, qid_col: str = "qid", id_col: str = "id",
                 score_col: str = "score") -> DataFrame:
    """Per-id minimum across query lists (score_fusion.rs Minimum)."""
    return results.groupBy(id_col).agg(F.min(score_col).alias("score"))


def fuse_product(results: DataFrame, qid_col: str = "qid", id_col: str = "id",
                 score_col: str = "score") -> DataFrame:
    """Per-id product across query lists (score_fusion.rs Product):
    exp(Σ ln s) for positive scores, with sign fixed by the count of
    negative factors; any zero factor zeroes the product."""
    s = F.col(score_col)
    return (
        results.groupBy(id_col).agg(
            F.sum(F.log(F.abs(s))).alias("_lnsum"),
            F.sum(F.when(s < 0, 1).otherwise(0)).alias("_negs"),
            F.max(F.when(s == 0, 1).otherwise(0)).alias("_anyzero"),
        )
        .select(
            id_col,
            F.when(F.col("_anyzero") == 1, F.lit(0.0)).otherwise(
                F.exp("_lnsum")
                * F.when(F.col("_negs") % 2 == 1, -1.0).otherwise(1.0)
            ).alias("score"),
        )
    )


def combine_breakdown(df: DataFrame, strategy: str = "weighted",
                      weights: dict | None = None,
                      vector_col: str = "vector_similarity",
                      graph_col: str = "graph_distance",
                      path_col: str = "path_score",
                      metadata_boost_col: str | None = None,
                      recency_boost_col: str | None = None) -> Column:
    """ScoreBreakdown combination (score_fusion.rs:14-227): blend the
    component score columns by strategy, then apply multiplicative boosts.
    Returns a Column; caller attaches it with withColumn."""
    comps = [F.coalesce(F.col(c), F.lit(0.0))
             for c in (vector_col, graph_col, path_col) if c in df.columns]
    if not comps:
        raise ValueError("no component score columns present")
    strategy = strategy.lower()
    if strategy == "average":
        base = sum(comps[1:], comps[0]) / float(len(comps))
    elif strategy in ("maximum", "max"):
        base = F.greatest(*comps) if len(comps) > 1 else comps[0]
    elif strategy == "minimum":
        base = F.least(*comps) if len(comps) > 1 else comps[0]
    elif strategy == "product":
        base = comps[0]
        for c in comps[1:]:
            base = base * c
    elif strategy == "weighted":
        w = weights or {}
        names = [c for c in (vector_col, graph_col, path_col) if c in df.columns]
        base = F.lit(0.0)
        for name, col in zip(names, comps):
            base = base + float(w.get(name, 1.0 / len(comps))) * col
    else:  # rrf over score proxies (score_fusion.rs:191-196)
        base = F.lit(0.0)
        for c in comps:
            base = base + 1.0 / (60.0 + 1.0 / F.greatest(c, F.lit(1e-9)))
    for bc in (metadata_boost_col, recency_boost_col):
        if bc and bc in df.columns:
            base = base * F.coalesce(F.col(bc), F.lit(1.0))
    return base


def normalize_scores(df: DataFrame, id_col: str = "id",
                     score_col: str = "score") -> DataFrame:
    """Min-max normalize a result list's scores to [0, 1]
    (velesql/hybrid.rs:236-265 normalize_scores): all-equal scores map
    to 1.0, an empty list stays empty. One broadcast stats row — no
    per-row Python, no second scan shuffle."""
    stats = df.agg(F.min(score_col).alias("_mn"), F.max(score_col).alias("_mx"))
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            score_col,
            F.when(F.col("_mx") == F.col("_mn"), F.lit(1.0)).otherwise(
                (F.col(score_col) - F.col("_mn"))
                / (F.col("_mx") - F.col("_mn"))),
        )
        .drop("_mn", "_mx")
    )


def fuse_pair(vector_results: DataFrame, graph_results: DataFrame,
              strategy: str = "rrf", k: int = RRF_K,
              vector_weight: float = 0.5, graph_weight: float = 0.5,
              limit: int | None = None, id_col: str = "id",
              score_col: str = "score") -> DataFrame:
    """Two-list hybrid fusion (velesql/hybrid.rs fuse_rrf/fuse_weighted/
    fuse_maximum — the MATCH+NEAR merge surface):

    - ``rrf``: score(d) = Σ 1/(k + rank_i(d)), 1-based rank per list —
      no normalization, robust to heterogeneous score scales.
    - ``weighted``: min-max normalize each list, then
      vector_weight·v + graph_weight·g (an id missing from one list
      contributes 0 for that side).
    - ``maximum``: min-max normalize each list, take the larger side.

    Returns (id, score) sorted descending (id tie-break for a
    deterministic distributed order), limited when ``limit`` is given.
    """
    v = vector_results.select(F.col(id_col), F.col(score_col))
    g = graph_results.select(F.col(id_col), F.col(score_col))
    if strategy == "rrf":
        tagged = (v.withColumn("_q", F.lit("v"))
                  .unionByName(g.withColumn("_q", F.lit("g"))))
        fused = fuse_rrf(tagged, k, "_q", id_col, score_col)
    elif strategy in ("weighted", "maximum"):
        vn = normalize_scores(v, id_col, score_col) \
            .withColumnRenamed(score_col, "_vs")
        gn = normalize_scores(g, id_col, score_col) \
            .withColumnRenamed(score_col, "_os")
        joined = vn.join(gn, id_col, "full_outer")
        vs = F.coalesce(F.col("_vs"), F.lit(0.0))
        os_ = F.coalesce(F.col("_os"), F.lit(0.0))
        expr = (vector_weight * vs + graph_weight * os_
                if strategy == "weighted" else F.greatest(vs, os_))
        fused = joined.select(id_col, expr.alias(score_col))
    else:
        raise ValueError(f"unknown pair-fusion strategy: {strategy}")
    out = fused.orderBy(F.desc(score_col), F.asc(id_col))
    return out.limit(limit) if limit is not None else out


def fuse_minmax_weighted(vector_results: DataFrame, other_results: DataFrame,
                         alpha: float, id_col: str = "id",
                         score_col: str = "score") -> DataFrame:
    """Min-max normalize each list to [0,1], blend α·v + (1−α)·o
    (velesql/hybrid.rs fuse_weighted). Missing side contributes 0."""

    def _norm(df: DataFrame, out: str) -> DataFrame:
        return normalize_scores(df, id_col, score_col) \
            .select(id_col, F.col(score_col).alias(out))

    v = _norm(vector_results, "_vs")
    o = _norm(other_results, "_os")
    return (
        v.join(o, id_col, "full_outer")
        .select(
            id_col,
            (
                alpha * F.coalesce(F.col("_vs"), F.lit(0.0))
                + (1.0 - alpha) * F.coalesce(F.col("_os"), F.lit(0.0))
            ).alias("score"),
        )
    )


def intersect_results(a: DataFrame, b: DataFrame, id_col: str = "id",
                      score_col: str = "score") -> DataFrame:
    """AND semantics (velesql/hybrid.rs intersect_results): keep only ids
    present in BOTH result lists; scores sum."""
    left = a.select(F.col(id_col), F.col(score_col).alias("_sa"))
    right = b.select(F.col(id_col), F.col(score_col).alias("_sb"))
    return left.join(right, id_col, "inner").select(
        id_col, (F.col("_sa") + F.col("_sb")).alias(score_col))


def fuse(strategy: str, results: DataFrame, params: dict | None = None,
         total_queries: int | None = None, qid_col: str = "qid",
         id_col: str = "id", score_col: str = "score",
         higher_is_better: bool = True) -> DataFrame:
    """Dispatch by strategy name
    (average|maximum|max|minimum|product|rrf|weighted)."""
    params = params or {}
    strategy = strategy.lower()
    if strategy == "average":
        return fuse_average(results, qid_col, id_col, score_col)
    if strategy in ("maximum", "max"):
        return fuse_maximum(results, qid_col, id_col, score_col)
    if strategy == "minimum":
        return fuse_minimum(results, qid_col, id_col, score_col)
    if strategy == "product":
        return fuse_product(results, qid_col, id_col, score_col)
    if strategy == "rrf":
        return fuse_rrf(results, int(params.get("k", RRF_K)), qid_col, id_col,
                        score_col, higher_is_better)
    if strategy == "weighted":
        if total_queries is None:
            raise ValueError("weighted fusion requires total_queries")
        return fuse_weighted(
            results,
            float(params.get("avg_weight", 0.4)),
            float(params.get("max_weight", 0.4)),
            float(params.get("hit_weight", 0.2)),
            total_queries, qid_col, id_col, score_col,
        )
    raise ValueError(f"unknown fusion strategy: {strategy}")


def mmr_rerank(emb: DataFrame, query_vec, k: int = 5, pool: int = 40,
               lam: float = 0.7, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein '98)
    — the RAG diversity step: greedily select k results maximizing
    ``lam*rel(d) - (1-lam)*max_{s in selected} sim(d, s)``.

    100 TB shape: the DISTRIBUTED stage is the exact top-``pool``
    relevance scan (TakeOrderedAndProject over the JVM cosine
    expression); the greedy loop then runs over the bounded pool on the
    driver (pool = k·oversample rows — the same k-rows-of-driver-state
    pattern as lloyd_kmeans centroids). Never quadratic in the corpus:
    pairwise sims exist only within the pool.

    Determinism contract: MMR scores quantize to 9 decimals before the
    argmax and ties break on ascending id, so an external oracle
    evaluating the same greedy recurrence (e.g. DuckDB with
    list_cosine_similarity, whose last-ulp sums differ from NumPy's)
    selects identically. Returns k rows (rank, <id_col>, rel).
    """
    import numpy as np

    if k < 1 or pool < k:
        raise ValueError("need k >= 1 and pool >= k")
    from velesdb_spark.functions.distance import metric_score

    qcol = double_array_lit(query_vec)
    cand = (emb.select(F.col(id_col), F.col(vec_col),
                       metric_score(F.col(vec_col), qcol, "cosine")
                       .alias("rel"))
            .orderBy(F.desc("rel"), id_col).limit(pool).collect())
    ids = [r[id_col] for r in cand]
    rel = np.array([float(r["rel"]) for r in cand])
    vecs = np.array([[float(x) for x in r[vec_col]] for r in cand],
                    dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    selected: list[int] = []
    max_sim = np.full(len(cand), -np.inf)
    for _ in range(min(k, len(cand))):
        if not selected:
            # quantize the pure-relevance first pick too: the determinism
            # contract must hold for iteration 1, where a last-ulp rel
            # difference would otherwise flip the whole greedy sequence
            score = np.round(rel, 9)
        else:
            score = np.round(lam * rel - (1.0 - lam) * max_sim, 9)
        best, best_key = None, None
        for i in range(len(cand)):
            if i in selected:
                continue
            key = (-score[i], ids[i])
            if best_key is None or key < best_key:
                best, best_key = i, key
        selected.append(best)
        sims = vecs @ vecs[best] / (norms * norms[best])
        max_sim = np.maximum(max_sim, sims)
    spark = emb.sparkSession
    out = [(rank + 1, ids[i], float(rel[i]))
           for rank, i in enumerate(selected)]
    id_type = dict(emb.dtypes)[id_col]
    return spark.createDataFrame(
        out, f"rank long, {id_col} {id_type}, rel double")


class PathScorer:
    """Graph-path relevance scoring for hybrid MATCH+NEAR results —
    reference ``search/query/score_fusion.rs:666-780`` (PathScorer):
    hop i (1-indexed) contributes ``decay^i * weight(rel_type_i)`` and
    the path score is the product over hops; an empty path (direct
    match) scores 1.0; ``score_length(n)`` is the pure distance factor
    ``decay^n``.

    ``rel_weight_col`` gives the distributed form: score an
    ARRAY<STRING> column of relationship types per row with one
    F.aggregate fold — JVM-side, no UDF — for scoring variable-length
    MATCH paths at scale.
    """

    def __init__(self, decay: float = 0.8,
                 rel_type_weights: dict | None = None,
                 default_weight: float = 1.0):
        self.distance_decay = min(max(float(decay), 0.0), 1.0)
        self.rel_type_weights = dict(rel_type_weights or {})
        self.default_weight = float(default_weight)

    def with_decay(self, decay: float) -> "PathScorer":
        self.distance_decay = min(max(float(decay), 0.0), 1.0)
        return self

    def with_rel_weight(self, rel_type: str, weight: float) -> "PathScorer":
        self.rel_type_weights[rel_type] = float(weight)
        return self

    def with_default_weight(self, weight: float) -> "PathScorer":
        self.default_weight = float(weight)
        return self

    def score_rel_types(self, rel_types) -> float:
        score = 1.0
        for i, rel in enumerate(rel_types, start=1):
            w = self.rel_type_weights.get(rel, self.default_weight)
            score *= (self.distance_decay ** i) * w
        # reference clamps every final score (score_fusion.rs applies
        # clamp(0.0, 1.0)); weights > 1.0 would otherwise overshoot
        return min(max(score, 0.0), 1.0)

    def score_path(self, path) -> float:
        """path = [(src, dst, rel_type), ...]; [] = direct match = 1.0."""
        return self.score_rel_types([rel for _, _, rel in path])

    def score_length(self, n_hops: int) -> float:
        return min(max(self.distance_decay ** n_hops, 0.0), 1.0)

    def rel_weight_col(self, rel_types_col) -> "F.Column":
        """Distributed score_rel_types over an ARRAY<STRING> column."""
        wmap = F.create_map(*[F.lit(x) for kv in
                              self.rel_type_weights.items() for x in kv]) \
            if self.rel_type_weights else None
        decay, dflt = self.distance_decay, self.default_weight

        def step(acc, rel):
            w = F.coalesce(wmap[rel], F.lit(dflt)) if wmap is not None \
                else F.lit(dflt)
            # acc = (score, hop_index): struct fold carries the 1-based
            # hop exponent through the aggregate
            return F.struct(
                (acc["s"] * F.pow(F.lit(decay), acc["i"] + 1) * w)
                .alias("s"), (acc["i"] + 1).alias("i"))

        init = F.struct(F.lit(1.0).alias("s"), F.lit(0).cast("int")
                        .alias("i"))
        raw = F.aggregate(rel_types_col, init, step)["s"]
        # same clamp(0.0, 1.0) as the scalar forms / score_fusion.rs
        return F.least(F.lit(1.0), F.greatest(F.lit(0.0), raw))

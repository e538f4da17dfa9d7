"""Search-quality metrics — ported operator surface from the reference
(crates/velesdb-core/src/metrics.rs, exported in lib.rs:223-226):
recall@k, precision@k, MRR, NDCG@k.

Two forms:
- Python list form (identical signatures/semantics to the reference) for
  driver-side evaluation of small result lists.
- DataFrame form for evaluating MANY queries at once: input is
  (qid, id, rank) results plus (qid, id) ground truth; output is per-query
  metrics plus a global mean — one join + one groupBy, scales with the
  number of queries.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ list form


def recall_at_k(ground_truth: Sequence, results: Sequence) -> float:
    """|truth ∩ results| / |truth| (metrics.rs:46-57)."""
    if not ground_truth:
        return 0.0
    truth = set(ground_truth)
    return sum(1 for r in results if r in truth) / len(ground_truth)


def precision_at_k(ground_truth: Sequence, results: Sequence) -> float:
    """|truth ∩ results| / |results| (metrics.rs:81-92)."""
    if not results:
        return 0.0
    truth = set(ground_truth)
    return sum(1 for r in results if r in truth) / len(results)


def mrr(ground_truth: Sequence, results: Sequence) -> float:
    """1 / rank of first relevant result, 0 if none (metrics.rs:113-124)."""
    truth = set(ground_truth)
    for rank, r in enumerate(results):
        if r in truth:
            return 1.0 / (rank + 1)
    return 0.0


def ndcg_at_k(relevances: Sequence[float], k: int) -> float:
    """DCG/IDCG with gain 2^rel − 1, discount log2(i+2) (metrics.rs:188-230)."""
    if not relevances:
        return 0.0
    k = min(k, len(relevances))

    def dcg(rels):
        return sum((2.0 ** r - 1.0) / math.log2(i + 2.0)
                   for i, r in enumerate(rels[:k]))

    actual = dcg(list(relevances))
    ideal = dcg(sorted(relevances, reverse=True))
    return actual / ideal if ideal > 0 else 0.0


# ------------------------------------------------------------ DataFrame form


def recall_precision_mrr_df(results: DataFrame, truth: DataFrame,
                            qid_col: str = "qid", id_col: str = "id",
                            rank_col: str = "rank") -> DataFrame:
    """Per-query recall/precision/MRR for batched evaluation.

    ``results``: (qid, id, rank) with rank 1-based; ``truth``: (qid, id).
    Returns (qid, recall, precision, mrr).
    """
    t = truth.select(F.col(qid_col).alias("_q"), F.col(id_col).alias("_tid"))
    truth_sizes = t.groupBy("_q").agg(F.count("*").alias("_nt"))
    r = results.select(F.col(qid_col).alias("_q"), F.col(id_col).alias("_rid"),
                       F.col(rank_col).alias("_rk"))
    res_sizes = r.groupBy("_q").agg(F.count("*").alias("_nr"))
    hits = r.join(t, (r["_q"] == t["_q"]) & (r["_rid"] == t["_tid"])) \
        .select(r["_q"].alias("_q"), "_rk")
    per_q = hits.groupBy("_q").agg(
        F.count("*").alias("_hits"), F.min("_rk").alias("_first"))
    return (
        truth_sizes.join(res_sizes, "_q", "left")
        .join(per_q, "_q", "left")
        .select(
            F.col("_q").alias(qid_col),
            (F.coalesce(F.col("_hits"), F.lit(0)) / F.col("_nt")).alias("recall"),
            F.when(F.coalesce(F.col("_nr"), F.lit(0)) > 0,
                   F.coalesce(F.col("_hits"), F.lit(0)) / F.col("_nr"))
            .otherwise(0.0).alias("precision"),
            F.when(F.col("_first").isNotNull(), 1.0 / F.col("_first"))
            .otherwise(0.0).alias("mrr"),
        )
    )


def ndcg_binary_df(results: DataFrame, truth: DataFrame, k: int,
                   qid_col: str = "qid", id_col: str = "id",
                   rank_col: str = "rank") -> DataFrame:
    """Per-query NDCG@k with binary relevance (metrics.rs ndcg with 0/1
    gains): DCG = Σ 1/log2(rank+1) over relevant hits within the top k;
    IDCG places all relevant docs first, cut at k. Returns (qid, ndcg)."""
    t = truth.select(F.col(qid_col).alias("_q"), F.col(id_col).alias("_tid"))
    truth_sizes = t.groupBy("_q").agg(F.count("*").alias("_nt"))
    r = results.filter(F.col(rank_col) <= k).select(
        F.col(qid_col).alias("_q"), F.col(id_col).alias("_rid"),
        F.col(rank_col).alias("_rk"))
    dcg = (r.join(t, (r["_q"] == t["_q"]) & (r["_rid"] == t["_tid"]))
           .select(r["_q"].alias("_q"), "_rk")
           .groupBy("_q")
           .agg(F.sum(F.lit(1.0) / F.log2(F.col("_rk") + 1)).alias("_dcg")))
    # IDCG@k = Σ_{i=1..min(nt,k)} 1/log2(i+1), computed with a native
    # sequence aggregate (no UDF)
    ideal_n = F.least(F.col("_nt"), F.lit(k))
    idcg = F.aggregate(
        F.sequence(F.lit(1), ideal_n),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1))
    return (truth_sizes.join(dcg, "_q", "left")
            .select(F.col("_q").alias(qid_col),
                    F.when(F.col("_nt") > 0,
                           F.coalesce(F.col("_dcg"), F.lit(0.0)) / idcg)
                    .otherwise(0.0).alias("ndcg")))


def evaluate_knn_recall(df: DataFrame, approx_results: DataFrame,
                        queries: list[tuple[int, list[float]]], k: int,
                        metric: str = "cosine", vector_col: str = "embedding",
                        id_col: str = "id",
                        exact: DataFrame | None = None) -> DataFrame:
    """Recall of an ANN result set against exact ground truth computed by the
    engine itself (operators/topk.knn_batch). Pass ``exact`` to reuse one
    ground-truth computation across several method evaluations."""
    from pyspark.sql import Window

    from velesdb_spark.operators.topk import knn_batch

    if exact is None:
        exact = knn_batch(df, queries, k, metric, vector_col, id_col) \
            .select("qid", F.col(id_col).alias("id"))
    # (score, id) tie-break — ties would otherwise get nondeterministic
    # ranks and make MRR vary between runs
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc(id_col))
    ranked = approx_results.withColumn("rank", F.row_number().over(w)) \
        .select("qid", F.col(id_col).alias("id"), "rank")
    return recall_precision_mrr_df(ranked, exact)

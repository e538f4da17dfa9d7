"""Search-quality + latency metrics — ported operator surface from the
reference (crates/velesdb-core/src/metrics.rs, exported in
lib.rs:223-226): recall@k, precision@k, MRR, NDCG@k, and latency
percentile stats (min/max/mean/p50/p95/p99).

Two forms:
- Python list form (identical signatures/semantics to the reference) for
  driver-side evaluation of small result lists / timing samples.
- DataFrame form for evaluating MANY queries at once: input is
  (qid, id, rank) results plus (qid, id) ground truth; output is per-query
  metrics plus a global mean — one join + one groupBy, scales with the
  number of queries.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
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


# ------------------------------------------------------------ latency stats


@dataclass
class LatencyStats:
    """min/max/mean/p50/p95/p99 of latency samples
    (metrics.rs:321-352 LatencyStats; units follow the caller — ms here,
    Duration in the reference)."""

    min: float = 0.0
    max: float = 0.0
    mean: float = 0.0
    p50: float = 0.0
    p95: float = 0.0
    p99: float = 0.0


def _nearest_rank_idx(p: float, n: int) -> int:
    # round-half-away-from-zero on (p/100)·(n−1), like Rust's .round()
    # (metrics.rs:407-427); samples are non-negative so half-up suffices
    return min(int(math.floor((p / 100.0) * (n - 1) + 0.5)), n - 1)


def compute_latency_percentiles(samples: Sequence[float]) -> LatencyStats:
    """Nearest-rank percentiles over a sample list
    (metrics.rs:354-406 compute_latency_percentiles): sort, index =
    round(p/100 · (n−1)). Empty input → all-zero stats."""
    if not samples:
        return LatencyStats()
    s = sorted(float(x) for x in samples)
    n = len(s)
    return LatencyStats(
        min=s[0], max=s[-1], mean=sum(s) / n,
        p50=s[_nearest_rank_idx(50, n)],
        p95=s[_nearest_rank_idx(95, n)],
        p99=s[_nearest_rank_idx(99, n)])


def latency_stats_df(log: DataFrame, ms_col: str = "ms",
                     group_cols: Sequence[str] = (),
                     approx: bool = False) -> DataFrame:
    """Latency stats as one distributed aggregation over a query-log table
    — the fleet-telemetry twin of compute_latency_percentiles, pairing
    with advisor.suggest_from_log's (labels, properties, predicates, ms)
    log shape. Returns (group..., n, min_ms, max_ms, mean_ms, p50, p95,
    p99).

    Exact mode reproduces the reference's nearest-rank definition via a
    sorted per-group sample array — right when per-group sample counts
    are bounded (telemetry windows). For unbounded 100 TB logs pass
    ``approx=True``: percentile_approx's constant-memory sketch replaces
    the array, same one-shuffle shape."""
    ms = F.col(ms_col).cast("double")
    gb = log.groupBy(*group_cols)
    base = [F.count("*").alias("n"),
            F.min(ms).alias("min_ms"), F.max(ms).alias("max_ms"),
            F.avg(ms).alias("mean_ms")]
    if approx:
        agg = gb.agg(*base, F.percentile_approx(ms, 0.5).alias("p50"),
                     F.percentile_approx(ms, 0.95).alias("p95"),
                     F.percentile_approx(ms, 0.99).alias("p99"))
        return agg
    arr = F.array_sort(F.collect_list(ms))

    def pick(p: float):
        # element_at is 1-based; same round-half-up nearest-rank index
        idx = (F.floor(F.lit(p / 100.0) * (F.size(arr) - 1).cast("double")
                       + F.lit(0.5)).cast("int") + 1)
        return F.element_at(arr, F.least(idx, F.size(arr)))

    return gb.agg(*base, pick(50).alias("p50"), pick(95).alias("p95"),
                  pick(99).alias("p99"))


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


# ------------------------------------------------- log2-bucket histogram

NUM_LOG2_BUCKETS = 64


def _log2_bucket(value: int) -> int:
    """storage/histogram.rs bucket_for: floor(log2(v)) clamped to the
    bucket range; 0 lands in bucket 0."""
    if value <= 0:
        return 0
    return min(int(value).bit_length() - 1, NUM_LOG2_BUCKETS - 1)


def _log2_bucket_value(bucket: int) -> int:
    """value_for_bucket: bucket midpoint 2^b + 2^(b-1) (1 for bucket 0)."""
    if bucket == 0:
        return 1
    return (1 << bucket) + (1 << max(bucket - 1, 0))


class Log2Histogram:
    """Fixed-size log2-bucket latency histogram
    (storage/histogram.rs:25-193 LockFreeHistogram): 64 buckets covering
    1 µs to ~18 h, O(1) record, approximate percentiles resolved from
    cumulative bucket counts and capped by the true max. The reference
    needs atomics for wait-free multi-thread recording; driver-side
    Python is single-threaded per interpreter, so plain ints carry the
    same semantics. For distributed logs use :func:`log2_histogram_df`,
    which produces the identical 64-bucket sketch with one aggregation
    and feeds :meth:`from_buckets`."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.buckets = [0] * NUM_LOG2_BUCKETS
        self._count = 0
        self._sum = 0
        self._min: int | None = None
        self._max = 0

    def record(self, value_us: int) -> None:
        v = int(value_us)
        self.buckets[_log2_bucket(v)] += 1
        self._count += 1
        self._sum += v
        self._min = v if self._min is None else min(self._min, v)
        self._max = max(self._max, v)

    @property
    def count(self) -> int:
        return self._count

    def is_empty(self) -> bool:
        return self._count == 0

    def min(self) -> int:
        return 0 if self._min is None else self._min

    def max(self) -> int:
        return self._max

    def mean(self) -> int:
        # integer division like the reference (sum/count on u64)
        return self._sum // self._count if self._count else 0

    def percentile(self, p: int) -> int:
        """histogram.rs:161-184: target = count·min(p,100)/100 (integer),
        first bucket whose cumulative count reaches it, midpoint value
        capped by the true max."""
        if self._count == 0:
            return 0
        target = self._count * min(int(p), 100) // 100
        cumulative = 0
        for i, n in enumerate(self.buckets):
            cumulative += n
            if cumulative >= target:
                return min(_log2_bucket_value(i), self._max)
        return self._max

    @classmethod
    def from_buckets(cls, buckets: Sequence[tuple[int, int]], count: int,
                     total: int, vmin: int, vmax: int) -> "Log2Histogram":
        """Rehydrate from a distributed sketch (log2_histogram_df row)."""
        h = cls()
        for b, n in buckets:
            h.buckets[int(b)] += int(n)
        h._count = int(count)
        h._sum = int(total)
        h._min = int(vmin) if count else None
        h._max = int(vmax)
        return h


def log2_histogram_df(log: DataFrame, us_col: str = "us",
                      group_cols: Sequence[str] = ()) -> DataFrame:
    """The histogram's distributed form: one aggregation reduces an
    unbounded log to (group..., buckets, n, sum_us, min_us, max_us) where
    ``buckets`` is the array of (bucket, count) pairs — a constant-size
    (≤64-entry) sketch per group, mergeable and driver-rehydratable via
    Log2Histogram.from_buckets. Bucket = floor(log2(us)) exactly like
    bucket_for (bit_length - 1)."""
    v = F.col(us_col).cast("long")
    # bit_length − 1 via base-2 string length — exact integer log2, no
    # float rounding at power-of-two boundaries (bucket_for uses
    # leading_zeros, i.e. bit arithmetic, never floats)
    bucket = F.when(v <= 0, F.lit(0)).otherwise(
        F.least((F.length(F.conv(v, 10, 2)) - 1).cast("int"),
                F.lit(NUM_LOG2_BUCKETS - 1)))
    per_bucket = (log.groupBy(*group_cols, bucket.alias("_bucket"))
                  .agg(F.count("*").alias("_n"),
                       F.sum(v).alias("_sum"),
                       F.min(v).alias("_min"), F.max(v).alias("_max")))
    return (per_bucket.groupBy(*group_cols)
            .agg(F.sort_array(F.collect_list(
                F.struct(F.col("_bucket").alias("bucket"),
                         F.col("_n").alias("n")))).alias("buckets"),
                 F.sum("_n").alias("n"),
                 F.sum("_sum").alias("sum_us"),
                 F.min("_min").alias("min_us"),
                 F.max("_max").alias("max_us")))

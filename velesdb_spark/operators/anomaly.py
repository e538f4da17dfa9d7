"""Robust per-group outlier detection: median/MAD z-scores (the
monitoring staple — resistant to the outliers it hunts, unlike
mean/stddev).

score(x) = |x − median(group)| / MAD(group), MAD = median(|x − median|);
rows with score > threshold are anomalies. Both medians are exact
interpolated percentiles (Spark ``percentile(…, 0.5)`` ≡ ANSI
``quantile_cont``), so any engine computing the same definition over
the same doubles lands on bit-identical cutoffs — no tolerance needed
at the gate.

Scale shape: two grouped aggregates (values → median; |x−med| → MAD)
and one broadcastable stats join back — the group-stats tables are
|groups| rows. EXACT percentile builds a per-group value multiset:
right when group cardinality is bounded (event types, status codes);
for high-cardinality measures at 100 TB pass ``approx=True`` to use
percentile_approx's constant-size sketch (the r7-verdict hazard note).
Constant groups (MAD = 0) yield no anomalies unless a value differs
from the median at all, in which case every differing row is flagged
(score = infinity semantics via the MAD=0 guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["robust_outliers"]


def _median(col: str, approx: bool, accuracy: int) -> F.Column:
    if approx:
        return F.expr(f"percentile_approx({col}, 0.5, {accuracy})")
    return F.expr(f"percentile({col}, 0.5)")


def robust_outliers(df: DataFrame, value_col: str, group_col: str,
                    threshold: float = 3.0, approx: bool = False,
                    accuracy: int = 10_000) -> DataFrame:
    """Rows of ``df`` whose robust z-score exceeds ``threshold``, with
    the score and group stats attached (med, mad, score columns)."""
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    from velesdb_spark.functions.staging import stage

    # med (one row per group) feeds BOTH the MAD derivation and the
    # stats join; unstaged, Catalyst re-plans the exact-percentile
    # aggregate — a full shuffle of the measure column — once per
    # consumer (plan-observed: df scanned 4x instead of the inherent 3).
    # Both staged frames are the |groups|-row working set.
    med = stage(df.groupBy(group_col)
                .agg(_median(value_col, approx, accuracy).alias("med")))
    mad = (df.join(med, group_col)
           .withColumn("_ad", F.abs(F.col(value_col) - F.col("med")))
           .groupBy(group_col)
           .agg(_median("_ad", approx, accuracy).alias("mad")))
    stats = stage(med.join(mad, group_col))
    scored = (df.join(F.broadcast(stats), group_col)
              .withColumn(
                  "score",
                  F.when(F.col("mad") > 0.0,
                         F.abs(F.col(value_col) - F.col("med"))
                         / F.col("mad"))
                  .otherwise(F.when(
                      F.abs(F.col(value_col) - F.col("med")) > 0.0,
                      F.lit(float("inf"))).otherwise(F.lit(0.0)))))
    return scored.filter(F.col("score") > float(threshold))

"""Cohort retention analysis — the product-analytics staple (cohort =
first-activity period; retention[k] = share of the cohort active k
periods later).

Scale shape: everything derives from the DISTINCT (user, bucket)
activity projection — one dedup shuffle over (long, long) pairs — then
a map-combinable min-aggregate for cohorts, one equi-join on user_id
(AQE-broadcastable when the user dimension is small relative to
events), and one count-distinct per (cohort, k) cell. The events table
is scanned once; no window, no UDF; every value is exact integer
arithmetic except the final retention share (one IEEE division of
exact counts — cross-engine bit-identical).

Bucketing uses integer floor division over epoch microseconds
(`div`, not float floor — the operators/rangejoin.py 2^53 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.staging import stage

__all__ = ["cohort_retention"]

WEEK_US = 7 * 86_400 * 1_000_000


def cohort_retention(events: DataFrame, ts_col: str = "ts",
                     user_col: str = "user_id",
                     bucket_us: int = WEEK_US) -> DataFrame:
    """(cohort_bucket, k, n_users, n_active, retention) — one row per
    cohort × offset with activity; k=0 rows have retention 1.0 by
    construction. cohort_bucket is the floor-divided epoch-µs bucket
    index (multiply by bucket_us for the period start)."""
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")
    bucket = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {int(bucket_us)}L")
    # activity feeds both the cohort derivation and the cells join, and
    # cohorts feeds both the cells join and the sizes aggregate; Catalyst
    # plans each consumer independently (0 ReusedExchange), re-running
    # the events scan + dedup shuffle per branch. Both frames are the
    # SMALL fixed-width working set — two longs per distinct
    # (user, bucket) pair, one row per user — never the event stream, so
    # staging them keeps the operator one-scan at any scale (r11
    # optimization round, same class as the lm.py/dedup.py fixes).
    activity = stage(events
                     .select(F.col(user_col).alias("_u"),
                             bucket.alias("_b"))
                     .distinct())
    cohorts = stage(
        activity.groupBy("_u").agg(F.min("_b").alias("_cohort")))
    cells = (activity.join(cohorts, "_u")
             .groupBy(F.col("_cohort"),
                      (F.col("_b") - F.col("_cohort")).alias("k"))
             .agg(F.count_distinct("_u").alias("n_active")))
    sizes = cohorts.groupBy("_cohort").agg(
        F.count("*").alias("n_users"))
    return (cells.join(sizes, "_cohort")
            .select(F.col("_cohort").alias("cohort_bucket"),
                    "k", "n_users", "n_active",
                    (F.col("n_active").cast("double")
                     / F.col("n_users")).alias("retention")))

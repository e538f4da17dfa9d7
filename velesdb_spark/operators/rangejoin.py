"""Bucketized interval (range) join — pair left rows with right rows
whose time lies within [left.t + lower, left.t + upper], per key.

Headroom beyond the reference (no temporal-join surface there): windowed
event correlation — "clicks within 5 minutes of an error", feature
windows around labels, dwell attribution — is core training-data-
pipeline work.

Spark-first execution: Catalyst turns a raw inequality join into
BroadcastNestedLoopJoin (quadratic per key at scale). This operator
instead EQUI-joins on (key, time_bucket) with bucket width = window
span: each right row lands in exactly one bucket, each left row probes
the two consecutive buckets its window can touch (r ∈ [l+lower,
l+lower+span] ⟹ floor(r/span) ∈ {floor((l+lower)/span), +1}), and an
exact range filter finishes the job. Cost is linear in |L|+|R| plus
true matches — the standard bucketized band join; the shuffle key is
(by, bucket), so skew follows the event-time distribution, not the
window size.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, on: str = "ts",
                  by: Optional[Sequence[str] | str] = None,
                  lower_us: int = 0, upper_us: int = 0,
                  suffix: str = "_right") -> DataFrame:
    """Inner interval join: all pairs (l, r) with
    l.{on} + lower_us <= r.{on} <= l.{on} + upper_us (timestamp columns
    compared in microseconds; numeric time columns compared raw). Right
    columns come back suffixed. ``lower_us <= upper_us`` required; a
    negative lower looks backward (e.g. (-300_000_000, 300_000_000) =
    within ±5 minutes). Each matching pair appears exactly once (a right
    row occupies one bucket; the two probed buckets are distinct)."""
    if lower_us > upper_us:
        raise ValueError("lower_us must be <= upper_us")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    span = max(int(upper_us) - int(lower_us), 1)

    def micros(df: DataFrame):
        c = F.col(on)
        if dict(df.dtypes)[on].startswith("timestamp"):
            # covers timestamp_ntz too — only differences matter here,
            # so the session-tz reinterpretation is harmless
            return F.unix_micros(c.cast("timestamp"))
        return c.cast("long")

    # Exact long floor-division: pmod is non-negative, so subtracting it
    # leaves an exact multiple and `div` (integral divide) equals floor.
    # F.floor(x / span) would round-trip through double and can flip the
    # bucket by one at |x| >= 2^53 (raw numeric time columns), silently
    # dropping a true match despite the exact range filter.
    def fdiv(col_name: str) -> F.Column:
        return F.expr(f"({col_name} - pmod({col_name}, {span}L))"
                      f" div {span}L")

    r_tag = (right.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns],
        micros(right).alias("_r_us"))
        .withColumn("_bkt", fdiv("_r_us")))
    l_tag = (left.select("*", micros(left).alias("_l_us"))
             .withColumn("_l_lo",
                         F.col("_l_us") + F.lit(int(lower_us)))
             .withColumn("_bkt0", fdiv("_l_lo"))
             .withColumn("_bkt", F.explode(F.array(
                 F.col("_bkt0"), F.col("_bkt0") + 1))))
    cond = [l_tag["_bkt"] == r_tag["_bkt"]]
    for c in by_cols:
        cond.append(l_tag[c] == r_tag[f"{c}{suffix}"])
    lo = F.col("_l_us") + F.lit(int(lower_us))
    hi = F.col("_l_us") + F.lit(int(upper_us))
    return (l_tag.join(r_tag, on=cond)
            .filter((F.col("_r_us") >= lo) & (F.col("_r_us") <= hi))
            .drop("_bkt", "_bkt0", "_l_lo", "_l_us", "_r_us"))

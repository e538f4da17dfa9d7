"""Funnel (ordered event-sequence) detection: which keys performed
step₁ → step₂ → … → stepₙ in order, and when.

Headroom beyond the reference — conversion/behavior funnels are a
standard event-analytics operator (MATCH_RECOGNIZE's most common use)
that Spark SQL lacks.

Spark-first execution: greedy earliest-occurrence dynamic program as n
map-side-combinable aggregates — step i is `min(ts) where type = stepᵢ
and ts > tᵢ₋₁`, joined per key. Greedy is exact for existence: taking
the EARLIEST valid occurrence of each step maximizes the time budget
left for later steps, so a key completes the greedy funnel iff any
ordered occurrence exists. Every aggregate shuffles on the same key, so
Catalyst reuses one exchange; the per-key step table is tiny next to
the event stream (distinct keys, not events). No sessionization state,
no collect_list of a power-user's history on one executor.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: Sequence[str], on: str = "ts",
           by: str = "user_id", type_col: str = "event_type",
           within_us: Optional[int] = None,
           strict_increase: bool = True) -> DataFrame:
    """(by, t0..t{n-1}) for every key completing all steps in order.

    - ``strict_increase``: step i must be strictly after step i−1
      (same-timestamp events do NOT chain); False allows ties.
    - ``within_us``: total funnel duration cap (last − first), in
      microseconds for timestamp columns, raw units otherwise.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    acc: Optional[DataFrame] = None
    for i, step in enumerate(steps):
        stepdf = events.filter(F.col(type_col) == step)
        if acc is not None:
            stepdf = stepdf.join(acc.select(by, f"t{i - 1}"), on=by)
            prev = F.col(f"t{i - 1}")
            cond = F.col(on) > prev if strict_increase \
                else F.col(on) >= prev
            stepdf = stepdf.filter(cond)
        st = stepdf.groupBy(by).agg(F.min(on).alias(f"t{i}"))
        acc = st if acc is None else acc.join(st, on=by)
    assert acc is not None
    if within_us is not None and len(steps) > 1:
        first, last = F.col("t0"), F.col(f"t{len(steps) - 1}")
        if dict(acc.dtypes)["t0"].startswith("timestamp"):
            first = F.unix_micros(first.cast("timestamp"))
            last = F.unix_micros(last.cast("timestamp"))
        acc = acc.filter(last - first <= F.lit(int(within_us)))
    return acc

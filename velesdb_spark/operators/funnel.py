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

With ``within_us`` the semantics are WINDOWED-funnel: a key qualifies
iff ANY ordered chain completes with (last − first) <= window — not
just the canonical greedy chain (view@0 view@100 click@101 within=5
qualifies via the @100 start). Exactness comes from a backward DP over
the event sequence: for each step-i event, the earliest completion time
of steps i..n starting there equals the greedy-forward completion, and
it is computed for ALL candidate starts at once with one running-min
window per step (the union+window trick from asof.py) — no per-start
re-scan, no quadratic pass.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.staging import stage


def funnel(events: DataFrame, steps: Sequence[str], on: str = "ts",
           by: str = "user_id", type_col: str = "event_type",
           within_us: Optional[int] = None,
           strict_increase: bool = True) -> DataFrame:
    """(by, t0..t{n-1}) for every key completing all steps in order.

    - ``strict_increase``: step i must be strictly after step i−1
      (same-timestamp events do NOT chain); False allows ties.
    - ``within_us``: total funnel duration cap (last − first), in
      microseconds for timestamp columns, raw units otherwise. A key
      qualifies iff ANY ordered chain fits the window; the returned
      chain is the greedy chain from the EARLIEST qualifying start
      (so its duration always respects the cap).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if within_us is not None and len(steps) > 1:
        starts = _qualifying_starts(events, steps, on, by, type_col,
                                    within_us, strict_increase)
        return _greedy_from(events, steps, on, by, type_col,
                            strict_increase, starts)
    return _greedy_from(events, steps, on, by, type_col,
                        strict_increase, starts=None)


def _greedy_from(events: DataFrame, steps: Sequence[str], on: str,
                 by: str, type_col: str, strict_increase: bool,
                 starts: Optional[DataFrame]) -> DataFrame:
    """Greedy earliest chain per key; when ``starts`` is given
    ((by, t0) pairs), the chain is anchored at that step-1 event."""
    acc: Optional[DataFrame] = None
    for i, step in enumerate(steps):
        if i == 0 and starts is not None:
            acc = starts
            continue
        stepdf = events.filter(F.col(type_col) == step)
        if acc is not None:
            # acc is consumed twice this iteration (the step filter-join
            # below AND the chain join after the aggregate); unstaged,
            # Catalyst re-plans the whole accumulated chain — and its
            # upstream event scans — once per consumer. acc is the tiny
            # per-key step table (one row per key still in the funnel),
            # so staging it keeps the operator at one events scan per
            # step (r11 optimization round).
            acc = stage(acc)
            stepdf = stepdf.join(acc.select(by, f"t{i - 1}"), on=by)
            prev = F.col(f"t{i - 1}")
            cond = F.col(on) > prev if strict_increase \
                else F.col(on) >= prev
            stepdf = stepdf.filter(cond)
        st = stepdf.groupBy(by).agg(F.min(on).alias(f"t{i}"))
        acc = st if acc is None else acc.join(st, on=by)
    assert acc is not None
    return acc


def _qualifying_starts(events: DataFrame, steps: Sequence[str],
                       on: str, by: str, type_col: str,
                       within_us: int,
                       strict_increase: bool) -> DataFrame:
    """(by, t0): the earliest step-1 occurrence per key whose greedy
    completion fits the window.

    Backward DP: iterate i = n−2 … 0; at each stage a union of step-i
    rows with step-(i+1) rows (the latter carrying their completion
    time) is scanned ONCE per key in descending time order, and a
    running min hands every step-i event the earliest completion
    reachable strictly (or loosely) after it. Greedy-forward optimality
    makes that min exactly the best achievable finish from that start,
    so the final filter (completion − start <= window) is exact
    windowed-funnel existence. n−1 window stages over per-key sorted
    events — linear in events, no per-start rescan.
    """
    ev = (events.filter(F.col(type_col).isin(list(steps)))
          .filter(F.col(on).isNotNull())   # null ts can't chain, and a
          # null completion would be mistaken for a cur-row marker below
          .select(by, F.col(on), F.col(type_col)))
    ts_us = F.col(on)
    is_ts = dict(ev.dtypes)[on].startswith("timestamp")
    if is_ts:
        ts_us = F.unix_micros(F.col(on).cast("timestamp"))
    # completion times for the LAST step are the events themselves
    comp = (ev.filter(F.col(type_col) == steps[-1])
            .select(by, F.col(on), ts_us.alias("_comp_us")))
    for i in range(len(steps) - 2, -1, -1):
        cur = (ev.filter(F.col(type_col) == steps[i])
               .select(by, F.col(on), F.lit(None).cast("long")
                       .alias("_comp_us"),
                       # strict: at equal ts the later step must sort
                       # AFTER cur in the DESC scan (invisible);
                       # loose: BEFORE (visible).
                       F.lit(0 if strict_increase else 1).alias("_tag")))
        nxt = comp.withColumn("_tag",
                              F.lit(1 if strict_increase else 0))
        w = (Window.partitionBy(by)
             .orderBy(F.col(on).desc(), F.col("_tag").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        comp = (cur.unionByName(nxt)
                .withColumn("_best", F.min("_comp_us").over(w))
                .filter(F.col("_comp_us").isNull()
                        & F.col("_best").isNotNull())
                .select(by, F.col(on), F.col("_best").alias("_comp_us")))
    qual = comp.withColumn("_start_us", ts_us).filter(
        F.col("_comp_us") - F.col("_start_us")
        <= F.lit(int(within_us)))
    return qual.groupBy(by).agg(F.min(on).alias("t0"))

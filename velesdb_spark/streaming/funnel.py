"""Streaming funnel detection — the continuous twin of
``operators/funnel.py``: which keys performed step₁ → step₂ → … → stepₙ
in order, detected as events ARRIVE.

Scale design: ``applyInPandasWithState`` with n+1 LONGS of state per key
(the greedy chain timestamps reached so far plus the next-step index) —
the batch operator re-aggregates the corpus per step; the stream needs
only the frontier of the greedy chain, so state is O(|keys| · n_steps)
forever, independent of event history, and needs no watermark. A key
emits exactly once, at the micro-batch where its chain completes.

Exactness contract (same as ``temporal.stream_asof_join``): equals the
batch greedy funnel when micro-batches arrive in per-key time order —
rows within a batch are sorted here, so one chronological file per
micro-batch reproduces batch semantics exactly. The greedy scan is the
batch recurrence unrolled: processing events in ascending (ts, step)
order, the first step-i event satisfying the chain condition IS
``min(ts) where type = stepᵢ and ts > tᵢ₋₁``.

Reference anchor: the reference's streaming surface is bounded edge
traces (graph/streaming_tests.rs); ordered-sequence detection over
event streams is the headroom analytics analogue.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def stream_funnel(events: DataFrame, steps: Sequence[str],
                  on: str = "ts", by: str = "user_id",
                  type_col: str = "event_type",
                  strict_increase: bool = True) -> DataFrame:
    """(by, t0_us..t{n-1}_us) emitted once per key, at completion.

    - timestamps are carried as epoch microseconds (exact longs);
      ``on`` may be a timestamp or a numeric column (used raw).
    - ``strict_increase``: step i must be strictly after step i−1; False
      allows same-timestamp chaining (step order breaks the tie, as in
      the batch operator's min-aggregate semantics).
    """
    if not steps:
        raise ValueError("stream_funnel needs at least one step")
    from pyspark.sql.streaming.state import GroupStateTimeout

    n = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}
    is_ts = dict(events.dtypes)[on].startswith("timestamp")
    ts_us = F.unix_micros(F.col(on).cast("timestamp")) if is_ts \
        else F.col(on).cast("long")
    # map step name → index JVM-side so the Python worker sees ints only
    idx_expr = F.lit(None).cast("int")
    for name, i in step_idx.items():
        idx_expr = F.when(F.col(type_col) == name, F.lit(i)) \
            .otherwise(idx_expr)
    prepped = (events.filter(F.col(type_col).isin(list(steps))
                             & F.col(on).isNotNull())
               .select(F.col(by).alias("_k"), ts_us.alias("_ts"),
                       idx_expr.alias("_step")))
    key_type = prepped.schema["_k"].dataType

    out_schema = StructType(
        [StructField(by, key_type)]
        + [StructField(f"t{i}_us", LongType()) for i in range(n)])
    state_schema = "idx long, " + ", ".join(f"t{i} long"
                                            for i in range(n))
    strict = bool(strict_increase)

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            st = list(state.get)
            idx, chain = int(st[0]), [x for x in st[1:]]
        else:
            idx, chain = 0, [None] * n
        if idx >= n:                       # already emitted — drain only
            for _ in pdfs:
                pass
            return
        rows: list = []
        for pdf in pdfs:
            rows.extend(zip((int(x) for x in pdf["_ts"]),
                            (int(x) for x in pdf["_step"])))
        # ascending time; step order breaks ties so loose chains see
        # step i−1 before a same-timestamp step i
        rows.sort()
        for ts, sidx in rows:
            if sidx != idx:
                continue
            if idx > 0:
                prev = chain[idx - 1]
                if (ts <= prev) if strict else (ts < prev):
                    continue
            chain[idx] = ts
            idx += 1
            if idx == n:
                break
        state.update(tuple([idx] + [c if c is not None else -1
                                    for c in chain]))
        if idx == n:
            yield pd.DataFrame(
                {by: [key[0]],
                 **{f"t{i}_us": [chain[i]] for i in range(n)}})

    return (prepped.groupBy("_k")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))

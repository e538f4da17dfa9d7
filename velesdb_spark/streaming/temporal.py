"""Streaming twins of the batch temporal joins (operators/asof.py,
operators/rangejoin.py) — round-8 verdict #7: the continuous-pipeline
forms of point-in-time alignment and windowed event correlation.

- ``stream_interval_join``: native Spark stream-stream inner join with
  watermarks on both sides and a two-sided event-time range condition —
  Spark's state store keeps only rows inside the watermark horizon, so
  state is bounded by (watermark + window) × arrival rate, not history.
- ``stream_asof_join``: Spark has no streaming as-of; built on
  ``applyInPandasWithState`` over a union of the two tagged sides,
  keyed by the grouping column. Per key the state carries the right
  rows still matchable; each batch is processed in event-time order.
  EXACTNESS CONTRACT: equals the batch as-of join when arrival is
  time-ordered across micro-batches (chronological file drops, or any
  source whose batches don't interleave event time); a right row
  arriving after a later left row was already emitted cannot
  retroactively re-match it — the same trade every streaming join makes
  once results are emitted. State is pruned to the single newest right
  at-or-before the highest left time seen (it may still be the match
  for future lefts) plus everything newer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)


def stream_interval_join(left: DataFrame, right: DataFrame,
                         on: str = "ts", by: str = "user_id",
                         lower_us: int = 0, upper_us: int = 0,
                         watermark: str = "2 hours",
                         suffix: str = "_right") -> DataFrame:
    """Streaming pairs (l, r) with l.{on}+lower <= r.{on} <= l.{on}+upper
    per key. Right columns come back suffixed. Inner join only (the
    exactly-once append-mode shape); both sides watermarked so the join
    state stays bounded — Catalyst derives the state-eviction predicate
    from the range condition itself."""
    if lower_us > upper_us:
        raise ValueError("lower_us must be <= upper_us")
    lw = left.withWatermark(on, watermark)
    rw = right.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns]) \
        .withWatermark(f"{on}{suffix}", watermark)
    cond = (
        (F.col(f"{by}{suffix}") == F.col(by))
        & (F.col(f"{on}{suffix}")
           >= F.col(on) + F.expr(f"INTERVAL {int(lower_us)} MICROSECOND"))
        & (F.col(f"{on}{suffix}")
           <= F.col(on) + F.expr(f"INTERVAL {int(upper_us)} MICROSECOND")))
    return lw.join(rw, cond)


def stream_asof_join(tagged: DataFrame, on: str = "ts",
                     by: str = "user_id", value_col: str = "value",
                     id_col: str = "event_id",
                     direction: str = "backward") -> DataFrame:
    """Streaming as-of over a UNIONED tagged stream: input columns
    (by, id_col, on, value_col, _side) with _side 0 = right (reference
    series) and 1 = left (probe). Emits one row per left event:
    (by, id_col, on, matched right time, matched right value) — nulls
    when no right row is at-or-before it. Backward direction only (the
    point-in-time-correct feature-join shape).

    applyInPandasWithState, one state per key: parallel arrays of the
    still-matchable right rows. Batches are sorted by (ts, side) in
    pandas so same-timestamp rights are visible to lefts, matching the
    batch operator's DuckDB-ASOF tie semantics."""
    if direction != "backward":
        raise ValueError("streaming as-of supports backward only")
    from pyspark.sql.streaming.state import GroupStateTimeout

    # times emitted as epoch MICROS (long): timestamp round-trips through
    # pandas shift with session-timezone; integers compare exactly against
    # any engine
    out_schema = StructType([
        StructField("u_key", LongType()),
        StructField("l_id", LongType()),
        StructField("l_ts_us", LongType()),
        StructField("r_ts_us", LongType()),
        StructField("r_val", DoubleType()),
    ])
    state_schema = "rts array<long>, rval array<double>"

    def update(key, pdfs, state):
        import bisect

        import pandas as pd

        rts, rval = (list(state.get[0]), list(state.get[1])) \
            if state.exists else ([], [])
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["_ts_us", "_side"], kind="mergesort")
            for ts_us, side, rid, val in zip(
                    pdf["_ts_us"], pdf["_side"], pdf["_id"], pdf["_val"]):
                if side == 0:
                    # keep buffer sorted: arrival within a batch is
                    # already time-ordered; a cross-batch straggler
                    # inserts mid-buffer (bisect keeps order)
                    i = bisect.bisect_right(rts, ts_us)
                    rts.insert(i, ts_us)
                    rval.insert(i, val)
                else:
                    i = bisect.bisect_right(rts, ts_us)
                    if i > 0:
                        out.append((key[0], rid, ts_us,
                                    rts[i - 1], rval[i - 1]))
                    else:
                        out.append((key[0], rid, ts_us, None, None))
                    # prune: rights strictly older than the newest one
                    # at-or-before this left can never match again
                    # (future ordered lefts are >= this one)
                    if i > 1:
                        del rts[:i - 1], rval[:i - 1]
        state.update((rts, rval))
        if out:
            yield pd.DataFrame(
                {"u_key": [o[0] for o in out],
                 "l_id": [o[1] for o in out],
                 "l_ts_us": [o[2] for o in out],
                 "r_ts_us": pd.array([o[3] for o in out],
                                     dtype="Int64"),
                 "r_val": [o[4] for o in out]})

    prepped = tagged.select(
        F.col(by).alias("_key"),
        F.col(id_col).alias("_id"),
        F.unix_micros(F.col(on).cast("timestamp")).alias("_ts_us"),
        F.col("_side"),
        F.col(value_col).cast("double").alias("_val"))
    return (prepped.groupBy("_key")
            .applyInPandasWithState(
                update, out_schema, state_schema,
                "append", GroupStateTimeout.NoTimeout))

"""Streaming twins of the batch temporal joins (operators/asof.py,
operators/rangejoin.py) — round-8 verdict #7: the continuous-pipeline
forms of point-in-time alignment and windowed event correlation.

- ``stream_interval_join``: native Spark stream-stream inner join with
  watermarks on both sides and a two-sided event-time range condition —
  Spark's state store keeps only rows inside the watermark horizon, so
  state is bounded by (watermark + window) × arrival rate, not history.
- ``stream_asof_join``: Spark has no streaming as-of; built on
  ``applyInPandasWithState`` over a union of the two tagged sides,
  keyed by the grouping column.

  Two modes (round-9 verdict #6 upgraded the default):

  * ``mode="buffered"`` (default): lefts are HELD in state until the
    event-time watermark passes their timestamp, then matched and
    emitted — so any right row arriving out of order but within the
    watermark delay is seen before the left finalizes. EXACTNESS
    CONTRACT: equals the batch as-of join whenever every row arrives
    no later than ``watermark`` behind the max event time seen — the
    same guarantee Spark's own stream-stream outer joins offer.
    Finalization rides EventTimeTimeout, so the trailing lefts flush
    in the engine's no-data micro-batch once the watermark catches up.
    Lefts at exactly the final watermark finalize too — a later right
    with the identical boundary timestamp is the one arrival this mode
    shares with Spark's own eviction boundary.

    END-OF-STREAM CAVEAT (found by the round-10 sf1 sweep): Spark's
    watermark tracks max event time in MILLISECONDS, so a left at the
    stream's maximal timestamp with a sub-millisecond component is
    never strictly passed by the watermark once input ends —
    availableNow emits no terminal watermark (unlike Flink's
    end-of-input MAX_WATERMARK). A bounded drain that must emit EVERY
    left should append a terminal heartbeat right (any key, event time
    past max + delay) as its last file — the pattern the gate and the
    out-of-order tests use. Unbounded pipelines don't care: the next
    arrival advances the watermark.
  * ``mode="eager"``: the round-8 behavior — each batch processed in
    event-time order, lefts emitted immediately. Exact only under
    time-ordered arrival across micro-batches; lowest latency, no
    left-side state.

  In both modes right-buffer state is pruned to the single newest
  right at-or-before the oldest still-relevant probe time plus
  everything newer.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)


@contextlib.contextmanager
def bounded_stage(spark: SparkSession, src_dir: str, ts_col: str = "ts",
                  heartbeat: dict | None = None,
                  delay: str = "INTERVAL 1 DAY",
                  file_glob: str = "*.parquet"):
    """Stage a BOUNDED file-stream input dir whose last file is a terminal
    heartbeat row — the end-of-stream contract buffered stream_asof_join
    drains need (module docstring: Spark watermarks are millisecond-
    granular and availableNow emits no terminal watermark, so a left at
    the corpus-maximal sub-ms timestamp never finalizes on its own).

    Yields a temp dir containing symlinks to every ``file_glob`` file in
    ``src_dir`` plus one ``zz_heartbeat.parquet`` whose ``ts_col`` is
    max(ts) + ``delay`` and whose other columns come from ``heartbeat``
    (missing columns stay NULL). The heartbeat file is written LAST so the
    file source's modification-time ordering lands it in the final batch,
    advancing the watermark past every real row. The dir (and the
    heartbeat scratch) is removed on exit.

    The heartbeat row itself flows through the caller's stream: give it
    column values the pipeline maps to the RIGHT side with a key/id no
    real left can join (the stream_asof gate uses a far-future purchase on
    user 0, id 10^12), or filter it out downstream by its sentinel id.
    """
    import glob as _glob

    stage = tempfile.mkdtemp(prefix="bounded_stage_")
    scratch = stage + "_hb"
    try:
        files = sorted(_glob.glob(os.path.join(src_dir, file_glob)))
        if not files:
            raise ValueError(f"no {file_glob} files under {src_dir}")
        for f in files:
            os.symlink(os.path.abspath(f), os.path.join(stage,
                                                        os.path.basename(f)))
        src = spark.read.parquet(*files)
        max_ts = src.agg(F.max(ts_col)).collect()[0][0]
        if max_ts is None:
            raise ValueError(f"{ts_col} is all-NULL; no watermark to pass")
        vals = dict(heartbeat or {})
        row = tuple(vals.get(f.name) for f in src.schema.fields)
        hb = (spark.createDataFrame([row], src.schema)
              .withColumn(ts_col, F.lit(max_ts) + F.expr(delay)))
        hb.coalesce(1).write.parquet(scratch)
        part = next(p for p in os.listdir(scratch) if p.endswith(".parquet"))
        # copy (not link): the heartbeat must carry the NEWEST mtime
        shutil.copy(os.path.join(scratch, part),
                    os.path.join(stage, "zz_heartbeat.parquet"))
        yield stage
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)


def drain_bounded(out: DataFrame, timeout_s: int = 180,
                  name: str | None = None) -> DataFrame:
    """Drain a streaming DataFrame to completion through an availableNow
    memory sink and return the result table. Raises TimeoutError (after
    stopping the query) if the drain overruns — reading a partial result
    would silently look like missing matches. Pair with bounded_stage()
    so the terminal-heartbeat contract is impossible to forget."""
    name = name or ("drain_" + uuid.uuid4().hex[:8])
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"bounded drain still running after {timeout_s}s — result "
            "incomplete; raise timeout_s")
    return out.sparkSession.table(name)


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
                     direction: str = "backward",
                     mode: str = "buffered",
                     watermark: str = "0 seconds") -> DataFrame:
    """Streaming as-of over a UNIONED tagged stream: input columns
    (by, id_col, on, value_col, _side) with _side 0 = right (reference
    series) and 1 = left (probe). Emits one row per left event:
    (by, id_col, on, matched right time, matched right value) — nulls
    when no right row is at-or-before it. Backward direction only (the
    point-in-time-correct feature-join shape).

    applyInPandasWithState, one state per key: parallel arrays of the
    still-matchable right rows (plus, in buffered mode, the lefts
    awaiting watermark finalization). Batches are sorted by (ts, side)
    in pandas so same-timestamp rights are visible to lefts, matching
    the batch operator's DuckDB-ASOF tie semantics. See the module
    docstring for the mode/exactness contracts."""
    if direction != "backward":
        raise ValueError("streaming as-of supports backward only")
    if mode not in ("buffered", "eager"):
        raise ValueError("mode must be 'buffered' or 'eager'")
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
    if mode == "buffered":
        state_schema += ", lid array<long>, lts array<long>"

    def update_buffered(key, pdfs, state):
        import bisect

        import pandas as pd

        if state.exists:
            st = state.get
            rts, rval = list(st[0]), list(st[1])
            lid, lts = list(st[2]), list(st[3])
        else:
            rts, rval, lid, lts = [], [], [], []
        wm_us = state.getCurrentWatermarkMs() * 1000
        if not state.hasTimedOut:
            for pdf in pdfs:
                for ts_us, side, rid, val in zip(
                        pdf["_ts_us"], pdf["_side"], pdf["_id"],
                        pdf["_val"]):
                    ts_us = int(ts_us)
                    if side == 0:
                        i = bisect.bisect_right(rts, ts_us)
                        rts.insert(i, ts_us)
                        rval.insert(i, val)
                    else:
                        lid.append(int(rid))
                        lts.append(ts_us)
        # finalize every left the watermark has passed: no right at-or-
        # before it can still be admitted (late input below the
        # watermark is filtered by the engine before reaching us)
        out, keep_id, keep_ts = [], [], []
        for pid, pts in sorted(zip(lid, lts), key=lambda t: (t[1], t[0])):
            if pts <= wm_us:
                i = bisect.bisect_right(rts, pts)
                if i > 0:
                    out.append((key[0], pid, pts, rts[i - 1], rval[i - 1]))
                else:
                    out.append((key[0], pid, pts, None, None))
            else:
                keep_id.append(pid)
                keep_ts.append(pts)
        # prune rights below the oldest still-possible probe time:
        # pending lefts are all > wm, and future admitted rows are
        # >= wm, so the bound is wm itself (or the oldest pending left
        # if that is somehow older — belt and braces)
        bound = min([wm_us] + keep_ts)
        i = bisect.bisect_right(rts, bound)
        if i > 1:
            del rts[:i - 1], rval[:i - 1]
        if keep_id or rts:
            state.update((rts, rval, keep_id, keep_ts))
            if keep_ts:
                # wake this key once the watermark reaches the oldest
                # pending left. The engine fires a timeout only when
                # watermark_ms > timestamp_ms (STRICT), so arm one ms
                # below the finalization point C = ceil(l_ts_us/1000):
                # firing then guarantees wm_ms >= C, i.e. wm_us >=
                # l_ts_us. Clamped to the current watermark (equality
                # is the earliest the engine accepts).
                want_ms = -(-min(keep_ts) // 1000) - 1  # ceil us->ms, -1
                state.setTimeoutTimestamp(
                    max(want_ms, state.getCurrentWatermarkMs()))
        else:
            state.remove()
        if out:
            yield pd.DataFrame(
                {"u_key": [o[0] for o in out],
                 "l_id": [o[1] for o in out],
                 "l_ts_us": [o[2] for o in out],
                 "r_ts_us": pd.array([o[3] for o in out], dtype="Int64"),
                 "r_val": [o[4] for o in out]})

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

    src = tagged
    if mode == "buffered":
        src = src.withWatermark(on, watermark)
    prepped = src.select(
        F.col(by).alias("_key"),
        F.col(id_col).alias("_id"),
        F.unix_micros(F.col(on).cast("timestamp")).alias("_ts_us"),
        F.col("_side"),
        F.col(value_col).cast("double").alias("_val"),
        # the event-time column itself must survive the projection or
        # the watermark (and EventTimeTimeout) detaches from the plan
        *([F.col(on)] if mode == "buffered" else []))
    if mode == "buffered":
        return (prepped.groupBy("_key")
                .applyInPandasWithState(
                    update_buffered, out_schema, state_schema,
                    "append", GroupStateTimeout.EventTimeTimeout))
    return (prepped.groupBy("_key")
            .applyInPandasWithState(
                update, out_schema, state_schema,
                "append", GroupStateTimeout.NoTimeout))

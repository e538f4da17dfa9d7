"""As-of (temporal alignment) join — match each left row to the most
recent right row at or before it (backward), or the earliest at or after
it (forward), optionally within a tolerance and per grouping key.

Headroom beyond the reference (which has no temporal join surface):
time-series feature alignment is a staple of training-data pipelines
(labels as-of event time, point-in-time-correct feature joins that avoid
leakage from the future).

Spark-first execution — the UNION + WINDOW formulation, not a range
join: tag right rows 0 and left rows 1, sort each ``by`` partition once
on (time, tag), and carry right payloads forward with
``last(ignorenulls)``. ONE shuffle on the grouping key, zero join
operators, no candidate-pair explosion — a range join on (key,
r.ts <= l.ts) degenerates to per-key cross products at 100 TB, while
this plan's cost is a sort of |L|+|R| rows per key. Spark has no native
as-of; DuckDB does (ASOF JOIN), which is exactly what makes the
operator oracle-checkable end-to-end.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_SIDE = "_asof_side"
_PAYLOAD = "_asof_payload"
_TS_FIELD = "_asof_ts"


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: Optional[Sequence[str] | str] = None,
              value_cols: Optional[Sequence[str]] = None,
              direction: str = "backward",
              tolerance_us: Optional[int] = None,
              suffix: str = "_right") -> DataFrame:
    """Left rows + the as-of-matched right payload columns (suffixed)
    + the matched right time as ``{on}{suffix}`` (null when unmatched).

    - ``direction='backward'``: greatest right.{on} <= left.{on}
      (DuckDB ``ASOF JOIN ... ON l.on >= r.on`` semantics);
      ``'forward'``: smallest right.{on} >= left.{on}.
    - ``tolerance_us``: drop matches farther than this many microseconds
      (timestamp columns; for numeric time columns the raw difference).
    - All carried columns (values AND matched time, nulls included)
      come from ONE right row. Among equal right times within a key,
      which row wins is partition-order-dependent — pre-aggregate right
      to unique (by, on) when that matters for cross-engine comparison.
    - ``by=None`` means a single global ordering: correct, but one
      partition — always pass keys at scale.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if value_cols is None:
        reserved = set(by_cols) | {on}
        value_cols = [c for c in right.columns if c not in reserved]
    if not value_cols:
        raise ValueError("right side has no value columns to carry")

    if _TS_FIELD in value_cols:
        raise ValueError(f"{_TS_FIELD!r} is reserved")
    # The whole right payload travels as ONE struct, carried with a
    # single last(ignorenulls): the struct is non-null for every right
    # row even when its value columns are NULL, so every carried column
    # (including the matched time) comes from the SAME right row —
    # per-column last(ignorenulls) would stitch an older non-null value
    # onto a newer row's timestamp, diverging from DuckDB ASOF.
    payload_type = StructType(
        [StructField(_TS_FIELD, right.schema[on].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in value_cols])
    l_tag = (left.withColumn(_SIDE, F.lit(1))
             .withColumn(_PAYLOAD, F.lit(None).cast(payload_type)))
    r_tag = right.select(
        *by_cols, F.col(on), F.lit(0).alias(_SIDE),
        F.struct(F.col(on).alias(_TS_FIELD),
                 *[F.col(c) for c in value_cols]).alias(_PAYLOAD))
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None)
                                     .cast(left.schema[c].dataType))
    combined = l_tag.unionByName(r_tag)

    # backward: ascending time, right (0) before left (1) at equal times
    # so a same-timestamp right row IS visible — matching DuckDB's >=.
    # forward is the mirrored scan.
    if direction == "backward":
        order = [F.col(on).asc(), F.col(_SIDE).asc()]
    else:
        order = [F.col(on).desc(), F.col(_SIDE).asc()]
    w = (Window.partitionBy(*by_cols).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = combined.select(
        *left.columns, _SIDE,
        F.last(_PAYLOAD, ignorenulls=True).over(w).alias(_PAYLOAD))
    out = (carried.filter(F.col(_SIDE) == 1)
           .select(*left.columns,
                   *[F.col(f"{_PAYLOAD}.{c}").alias(f"{c}{suffix}")
                     for c in value_cols],
                   F.col(f"{_PAYLOAD}.{_TS_FIELD}")
                   .alias(f"{on}{suffix}")))

    if tolerance_us is not None:
        lt, rt = F.col(on), F.col(f"{on}{suffix}")
        if dict(out.dtypes)[on].startswith("timestamp"):
            lt = F.unix_micros(lt.cast("timestamp"))
            rt = F.unix_micros(rt.cast("timestamp"))
        gap = (lt - rt) if direction == "backward" else (rt - lt)
        keep = rt.isNotNull() & (gap <= F.lit(int(tolerance_us)))
        out = out.select(
            *left.columns,
            *[F.when(keep, F.col(f"{c}{suffix}"))
              .otherwise(F.lit(None)).alias(f"{c}{suffix}")
              for c in value_cols],
            F.when(keep, F.col(f"{on}{suffix}")).otherwise(F.lit(None))
            .alias(f"{on}{suffix}"))
    return out

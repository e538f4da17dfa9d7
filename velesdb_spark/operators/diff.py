"""Snapshot diff — CDC-style delta between two versions of a keyed
dataset: which rows were added, removed, or changed.

Headroom beyond the reference: corpus refreshes (recrawls, nightly
dumps) feed training pipelines as SNAPSHOTS, and the first question is
always the delta — what to re-embed, re-chunk, re-index. The engine's
durable store (storage.py) answers "what is current"; this answers
"what moved between two currents".

Spark-first: ONE full-outer shuffle join on the key (co-partitioned for
free when both sides are bucketed on it) + null-safe column compares in
whole-stage codegen. No hashing detour — eqNullSafe compares values
directly, so type-lossy canonicalization can't produce false
'unchanged' verdicts.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame,
                  keys: Sequence[str] | str,
                  compare_cols: Optional[Sequence[str]] = None,
                  include_unchanged: bool = False) -> DataFrame:
    """(keys..., change_type) with change_type ∈ added | removed |
    changed (| unchanged when ``include_unchanged``). ``compare_cols``
    defaults to every shared non-key column; a row differing in ANY
    compared column (null-safe) is 'changed'."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c not in keys and c in new.columns]
    o = old.select(*keys,
                   *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
                   F.lit(1).alias("_in_old"))
    n = new.select(*keys,
                   *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
                   F.lit(1).alias("_in_new"))
    j = o.join(n, on=keys, how="full_outer")
    if compare_cols:
        differs = reduce(lambda a, b: a | b,
                         [~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
                          for c in compare_cols])
    else:
        differs = F.lit(False)
    change = (F.when(F.col("_in_old").isNull(), F.lit("added"))
              .when(F.col("_in_new").isNull(), F.lit("removed"))
              .when(differs, F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    out = j.select(*keys, change.alias("change_type"))
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out

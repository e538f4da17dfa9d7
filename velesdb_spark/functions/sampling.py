"""Deterministic weighted sampling — reproducible quality-weighted
corpus subsets (training-mix construction) with NO RNG state.

Weighted reservoir sampling (Efraimidis–Spirakis A-ES) ranks rows by
u^(1/w); the float pow makes cross-engine reproducibility fragile (pow
and ln differ in final ulps across math libraries, which can flip
near-tied ranks). This module uses the pow-free DISCRETE equivalent:

    key(row) = max_{j=1..w} md5(seed ':' id ':' j)

The overall maximum over all (row, j) draws is uniform over the Σw
draws, so P(row wins the top spot) = w_row / Σw — exactly the A-ES
first pick — and taking the top-k orders rows by successive weighted
maxima (sampling without replacement). Keys are distinct md5 hex
strings compared lexicographically (fixed-length lowercase hex ⇒
lexicographic = numeric), so ties are impossible and ANY engine that
can md5 reproduces the ranking bit-for-bit.

Cost is Σw hash evaluations (JVM-side, whole-stage codegen) — right
for integer weights like capped token counts. At extreme weights,
quantize via ``cap`` (default 64): sampling proportions follow the
capped weights, which is usually the intent anyway (a 1M-token doc
should not be 20 000× likelier than a 50-token one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def weighted_key(id_col: Column, weight: Column, seed: str = "ws",
                 cap: int = 64) -> Column:
    """The max-of-w-hashes ranking key (hex string, higher = earlier)."""
    w = F.greatest(F.lit(1), F.least(weight.cast("long"), F.lit(int(cap))))
    return F.array_max(F.transform(
        F.sequence(F.lit(1), w),
        lambda j: F.md5(F.concat(F.lit(f"{seed}:"),
                                 id_col.cast("string"),
                                 F.lit(":"), j.cast("string")))))


def weighted_sample_topk(df: DataFrame, k: int, weight_col: str,
                         id_col: str = "id", seed: str = "ws",
                         cap: int = 64) -> DataFrame:
    """Top-k weighted sample: rows + their ranking key, highest first —
    deterministic for a given seed, reproducible in any md5-capable
    engine, TakeOrderedAndProject physical plan (no full sort)."""
    key = weighted_key(F.col(id_col), F.col(weight_col), seed, cap)
    return (df.withColumn("_wkey", key)
            .orderBy(F.desc("_wkey"), F.asc(id_col))
            .limit(int(k)))

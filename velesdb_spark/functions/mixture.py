"""Training-mixture construction: downsample strata to hit target
proportions, deterministically.

The last step of corpus curation: given per-stratum target shares
(e.g. 50% en / 20% code / 30% rest), pick the largest total T the
corpus can serve — T = min over targeted strata of n_s / share_s — and
keep each stratum at rate share_s·T / n_s via the engine's standard
md5-bucket trick (no RNG: stable across engines, partitionings,
reruns, and appends that don't touch a row's id).

Spark-first: one map-combinable count per stratum, a broadcast join of
the tiny rates table, a map-only filter. Rates are quantized to
BASIS-POINT integers with floor() so the cross-engine keep decision
compares integers, never floats.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BP = 10_000  # basis points — rate quantum for integer comparisons


def mixture_rates(counts: Mapping[str, int],
                  targets: Mapping[str, float]) -> dict[str, int]:
    """Per-stratum keep rates in basis points. Strata absent from
    ``targets`` are dropped (rate 0). T = min_s n_s/share_s is the
    largest total for which every targeted stratum can supply its
    share; rate_s = share_s·T/n_s ≤ 1 by construction."""
    if not targets:
        raise ValueError("targets must name at least one stratum")
    if abs(sum(targets.values()) - 1.0) > 1e-9:
        raise ValueError("target shares must sum to 1")
    missing = [s for s in targets if counts.get(s, 0) == 0]
    if missing:
        raise ValueError(f"strata with target but no rows: {missing}")
    total = min(counts[s] / share for s, share in targets.items()
                if share > 0)
    return {s: int((share * total / counts[s]) * BP)
            for s, share in targets.items() if share > 0}


def _apply_rates(df: DataFrame, stratum_col: str,
                 rates: Mapping[str, int], id_col: str,
                 seed: str) -> DataFrame:
    rate_col = F.lit(None).cast("long")
    for s, bp in rates.items():
        rate_col = F.when(F.col(stratum_col) == s, F.lit(bp)) \
            .otherwise(rate_col)
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
        1, 6), 16, 10).cast("long") % BP)
    return df.filter(rate_col.isNotNull() & (bucket < rate_col))


def make_mixture(df: DataFrame, stratum_col: str,
                 targets: Mapping[str, float], id_col: str = "id",
                 seed: str = "mix") -> DataFrame:
    """Rows surviving the mixture sample. Kept iff
    md5-bucket(seed, id) < rate_bp for the row's stratum; strata not in
    ``targets`` are dropped entirely."""
    counts = {r[0]: r[1] for r in
              df.groupBy(stratum_col).count().collect()}
    rates = mixture_rates(counts, targets)
    return _apply_rates(df, stratum_col, rates, id_col, seed)


def make_mixture_weighted(df: DataFrame, stratum_col: str,
                          targets: Mapping[str, float], weight_col: str,
                          id_col: str = "id",
                          seed: str = "mix") -> DataFrame:
    """Token-budget mixture: targets are shares of total WEIGHT (token
    or char count), not document count — the form an LLM data recipe is
    actually written in ("50% of training TOKENS from en"). T becomes
    the largest total weight every targeted stratum can serve
    (min_s W_s/share_s) and each stratum keeps rows at rate
    share_s·T/W_s, so the KEPT weight hits the target shares in
    expectation while every surviving document stays whole (no
    mid-document truncation; exactness at the document level would
    require bin-packing, which no curation pipeline needs).

    Same engine-portable md5-bucket keep decision as ``make_mixture``;
    one map-combinable SUM per stratum replaces the COUNT. Weights must
    be non-negative integers (int64 sums are exact cross-engine;
    float weight sums would make the basis-point rates
    addition-order-dependent)."""
    # coalesce: a stratum whose weights are all NULL sums to NULL, which
    # must read as "no servable weight" (0) so mixture_rates raises the
    # intended targeted-stratum-empty error instead of a TypeError
    weights = {r[0]: r[1] for r in
               df.groupBy(stratum_col)
               .agg(F.coalesce(F.sum(F.col(weight_col).cast("long")),
                               F.lit(0)).alias("w"))
               .collect()}
    rates = mixture_rates(weights, targets)
    return _apply_rates(df, stratum_col, rates, id_col, seed)

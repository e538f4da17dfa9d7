"""Single-pass sufficient-statistics OLS regression and Pearson
correlation — the distributed "fit a line to a trillion rows" primitive
(drift monitoring, feature/quality calibration, scaling-law fits over
corpus metadata).

Scale shape: ONE map-side-combinable aggregate per group collects the
six moment sums (n, Σx, Σy, Σxy, Σx², Σy²); everything downstream is
closed-form arithmetic over those six numbers. Shuffle payload is six
int64/doubles per group regardless of row count — this is the sum-form
identity the classic streaming/parallel regression literature uses, and
it is embarrassingly combinable (any partitioning of the rows merges by
adding the sums).

Determinism contract (the repo's cross-engine gate convention): on
integer-valued features every moment sum is EXACT int64 (no float
accumulation order anywhere), and slope/intercept/r/R² derive from
those exact integers through one fixed arithmetic expression tree — so
Spark and any other engine computing the same closed forms agree to the
final ulp, and round(…, 6) gate columns can never straddle a boundary.
int64 headroom: Σxy over N rows of x·y ≤ M needs N·M < 2⁶³ — e.g. 10¹²
rows of 10⁶-magnitude products; beyond that, pre-scale or switch the
sums to DecimalType(38,0).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["moment_sums", "linreg", "pearson_corr", "profile"]


def moment_sums(df: DataFrame, x_col: str, y_col: str,
                group_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """The six combinable sums per group: n, sx, sy, sxy, sxx, syy
    (exact int64 when the inputs are integer-typed)."""
    x, y = F.col(x_col), F.col(y_col)
    keys = list(group_cols or [])
    base = df.groupBy(*keys) if keys else df.groupBy()
    return base.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"))


def _fit_cols():
    """Closed-form OLS/correlation over the moment sums. The exact
    integer sums are cast to double ONCE, then combined through a fixed
    expression tree — identical associativity in any engine."""
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    num = n * sxy - sx * sy          # n·Σxy − Σx·Σy
    den_x = n * sxx - sx * sx        # n·Σx² − (Σx)²
    den_y = n * syy - sy * sy
    slope = F.when(den_x != 0.0, num / den_x)
    intercept = F.when(den_x != 0.0, (sy - (num / den_x) * sx) / n)
    r = F.when((den_x > 0.0) & (den_y > 0.0),
               num / F.sqrt(den_x * den_y))
    # R² of simple OLS == r² — but derive it the sum-form way so a
    # disagreeing engine can't hide behind the identity:
    # SS_res = SS_tot − num²/den_x (all from the exact sums), scaled n×
    r2 = F.when((den_x > 0.0) & (den_y > 0.0),
                (num * num / den_x) / den_y)
    return slope, intercept, r, r2


def linreg(df: DataFrame, x_col: str, y_col: str,
           group_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Per-group simple OLS y = intercept + slope·x plus Pearson r and
    R². Degenerate groups (constant x) get NULL slope/intercept; groups
    with constant x or y get NULL r/r2. One combinable aggregate, no
    second pass, no window, no UDF."""
    sums = moment_sums(df, x_col, y_col, group_cols)
    slope, intercept, r, r2 = _fit_cols()
    return sums.select(
        *(group_cols or []), "n",
        slope.alias("slope"), intercept.alias("intercept"),
        r.alias("r"), r2.alias("r2"))


def pearson_corr(df: DataFrame, x_col: str, y_col: str,
                 group_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Per-group Pearson correlation only (same single-pass contract)."""
    sums = moment_sums(df, x_col, y_col, group_cols)
    _, _, r, _ = _fit_cols()
    return sums.select(*(group_cols or []), "n", r.alias("r"))


def profile(df: DataFrame, columns: Optional[Sequence[str]] = None,
            approx_distinct: bool = False) -> DataFrame:
    """Table profile — the ANALYZE/StatsCollector staple (reference
    collection/stats/mod.rs CollectionStats + ColumnStats): one row per
    column with (col_name, n, n_null, n_distinct, min_val, max_val).

    ONE aggregate pass computes every column's stats simultaneously
    (4·|cols|+1 agg expressions), then the single result row unpivots
    JVM-side into per-column rows — the table is scanned once no matter
    how many columns. min/max are cast to string AFTER aggregating in
    the native type (so numeric columns order numerically).

    ``approx_distinct=True`` swaps count_distinct for the HLL sketch —
    the 100 TB spelling twice over: exact distinct of a high-cardinality
    column shuffles the value set, AND multiple count_distinct in one
    aggregate compile to an Expand that multiplies scan rows by the
    number of profiled columns; the HLL sketches are constant-size and
    Expand-free.
    """
    cols = list(columns or df.columns)
    distinct_fn = (F.approx_count_distinct if approx_distinct
                   else F.count_distinct)
    # df[c] / backtick-quoted read-backs: a legal top-level column name
    # containing a dot must not be re-parsed as struct access; an
    # embedded backtick (also legal) must be doubled or it terminates
    # the quote and the read-back misparses
    def bq(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    aggs = [F.count("*").alias("_n")]
    for c in cols:
        col = F.col(bq(c))
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_null_{c}"),
            distinct_fn(col).alias(f"_dist_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col("_n").alias("n"),
                 F.col(bq(f"_null_{c}")).alias("n_null"),
                 F.col(bq(f"_dist_{c}")).alias("n_distinct"),
                 F.col(bq(f"_min_{c}")).alias("min_val"),
                 F.col(bq(f"_max_{c}")).alias("max_val"))
        for c in cols])
    return (row.select(F.explode(per_col).alias("p")).select("p.*")
            .orderBy("col_name"))

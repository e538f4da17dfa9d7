"""Exactness preconditions for the r11 window rewrites (tpch_q2/q17/q20).

The aggregate+join-back → window-over-joined-frame rewrites are
BIT-exact only because:
- tpch_q2 uses MIN (exact over any IEEE set — no precondition), and
- tpch_q17 (AVG over l_quantity) / tpch_q20 (two-level SUM of
  l_quantity) regroup double additions, which is order-sensitive for
  general doubles but exact when every value is an integer-valued
  double with sums far below 2^53 (integer arithmetic is associative).

These tests pin that precondition so a fixture regeneration or refactor
that introduces fractional quantities fails the suite instead of
silently flipping the oracle hash (r11 VERDICT "what's wrong" #4).
"""

from __future__ import annotations

import glob
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

FIXTURE_DIRS = sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf_dir", FIXTURE_DIRS,
                         ids=[os.path.basename(d) for d in FIXTURE_DIRS])
def test_lineitem_quantity_integer_valued(sf_dir):
    """Every l_quantity in the gate fixtures is an integer-valued double
    (and small enough that per-part sums stay exact in float64)."""
    path = os.path.join(sf_dir, "lineitem.parquet")
    col = pq.read_table(path, columns=["l_quantity"])["l_quantity"] \
        .combine_chunks().cast("double")
    fractional = pc.sum(pc.not_equal(pc.floor(col), col)).as_py() or 0
    assert fractional == 0, (
        f"{path}: {fractional} fractional l_quantity values — the "
        "tpch_q17/q20 window rewrites' bit-exactness precondition broke")
    # magnitude guard: values small enough that any realistic per-part
    # sum stays far below 2^53 (exact integer range of float64)
    assert pc.max(col).as_py() < 2**20


def test_window_sum_avg_equal_joinback_on_integer_doubles(spark):
    """Property: on integer-valued doubles, SUM/AVG OVER (PARTITION BY k)
    is bit-identical to groupBy(k).agg(...) joined back — the exact
    claim the tpch_q17/q20 rewrites rest on, on adversarial groupings
    (one giant group, singletons, values spanning 2^0..2^40)."""
    rows = []
    # one giant group with values spanning many binades (order-sensitive
    # for fractional doubles, exact for integers)
    vals = [float(3 ** i % (2 ** 40)) for i in range(200)]
    rows += [(0, v) for v in vals]
    # singleton groups
    rows += [(k, float(k * 7 + 1)) for k in range(1, 30)]
    # medium groups with large/small mixes
    for k in range(30, 40):
        rows += [(k, float(2 ** 40)), (k, 1.0), (k, float(2 ** 30)), (k, 3.0)]
    df = spark.createDataFrame(rows, "k int, q double")

    w = Window.partitionBy("k")
    windowed = df.select(
        "k", "q",
        F.sum("q").over(w).alias("s"),
        F.avg("q").over(w).alias("a"))
    agg = df.groupBy("k").agg(F.sum("q").alias("s2"), F.avg("q").alias("a2"))
    joined = df.join(agg, "k").select("k", "q", "s2", "a2")

    lhs = {(r["k"], r["q"]): (r["s"], r["a"]) for r in windowed.collect()}
    rhs = {(r["k"], r["q"]): (r["s2"], r["a2"]) for r in joined.collect()}
    assert set(lhs) == set(rhs)
    for key in lhs:
        # bit-exact equality, not approx — this is the rewrite's claim
        assert lhs[key] == rhs[key], (key, lhs[key], rhs[key])


def test_min_window_equals_joinback_any_doubles(spark):
    """tpch_q2's MIN rewrite needs no integer precondition: MIN over the
    identical set is exact for ANY doubles, fractional included."""
    rows = [(k, (1.0 / 3.0) * i + k * 0.1) for k in range(5)
            for i in range(37)]
    df = spark.createDataFrame(rows, "k int, c double")
    w = Window.partitionBy("k")
    lhs = {(r["k"], r["c"]): r["m"] for r in
           df.select("k", "c", F.min("c").over(w).alias("m")).collect()}
    agg = df.groupBy("k").agg(F.min("c").alias("m2"))
    rhs = {(r["k"], r["c"]): r["m2"] for r in
           df.join(agg, "k").select("k", "c", "m2").collect()}
    assert lhs == rhs

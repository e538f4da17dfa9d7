"""Sufficient-statistics OLS / Pearson (functions/stats.py) vs NumPy."""

from __future__ import annotations

import numpy as np
import pytest

from velesdb_spark.functions.stats import linreg, moment_sums, pearson_corr

ROWS = [
    ("a", 10, 25), ("a", 20, 41), ("a", 30, 62), ("a", 40, 79),
    ("a", 50, 103),
    ("b", 5, 5), ("b", 6, 5), ("b", 7, 5), ("b", 8, 5),   # constant y
    ("c", 3, 9), ("c", 3, 11), ("c", 3, 13),              # constant x
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, ["g", "x", "y"])


def test_linreg_matches_numpy(spark, df):
    got = {r["g"]: r for r in linreg(df, "x", "y", ["g"]).collect()}
    xs = np.array([x for g, x, _ in ROWS if g == "a"], dtype=float)
    ys = np.array([y for g, x, y in ROWS if g == "a"], dtype=float)
    slope, intercept = np.polyfit(xs, ys, 1)
    r = np.corrcoef(xs, ys)[0, 1]
    a = got["a"]
    assert a["n"] == 5
    assert a["slope"] == pytest.approx(slope, abs=1e-9)
    assert a["intercept"] == pytest.approx(intercept, abs=1e-9)
    assert a["r"] == pytest.approx(r, abs=1e-12)
    assert a["r2"] == pytest.approx(r * r, abs=1e-12)


def test_degenerate_groups_null(spark, df):
    got = {r["g"]: r for r in linreg(df, "x", "y", ["g"]).collect()}
    b, c = got["b"], got["c"]
    # constant y: slope/intercept defined (slope 0), r/r2 NULL
    assert b["slope"] == pytest.approx(0.0)
    assert b["r"] is None and b["r2"] is None
    # constant x: everything NULL
    assert c["slope"] is None and c["intercept"] is None
    assert c["r"] is None


def test_moment_sums_combinable(spark, df):
    """Sums over any row partition merge by addition — fit(whole) ==
    fit(sums(half1) + sums(half2))."""
    h1 = df.filter("x <= 20")
    h2 = df.filter("x > 20")
    whole = {tuple(r)[:1]: tuple(r)[1:]
             for r in moment_sums(df, "x", "y", ["g"]).collect()}
    parts = {}
    for h in (h1, h2):
        for r in moment_sums(h, "x", "y", ["g"]).collect():
            key, vals = (r["g"],), (r["n"], r["sx"], r["sy"], r["sxy"],
                                    r["sxx"], r["syy"])
            parts[key] = tuple(
                a + b for a, b in zip(parts.get(key, (0,) * 6), vals))
    assert whole == parts


def test_global_fit_no_groups(spark, df):
    one = linreg(df.filter("g = 'a'"), "x", "y").collect()
    assert len(one) == 1 and one[0]["n"] == 5


def test_pearson_only(spark, df):
    got = {r["g"]: r["r"] for r in pearson_corr(df, "x", "y",
                                                ["g"]).collect()}
    xs = np.array([x for g, x, _ in ROWS if g == "a"], dtype=float)
    ys = np.array([y for g, x, y in ROWS if g == "a"], dtype=float)
    assert got["a"] == pytest.approx(np.corrcoef(xs, ys)[0, 1], abs=1e-12)


def test_single_aggregate_plan(spark, df):
    """Plan contract: one shuffle (the groupBy), no window, no second
    scan-side exchange."""
    plan = linreg(df, "x", "y", ["g"])._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "Window" not in plan


def test_profile_matches_manual(spark):
    from velesdb_spark.functions.stats import profile

    rows = [(1, "a", None), (2, "b", 5.0), (2, None, 5.0), (4, "c", 7.0)]
    df = spark.createDataFrame(rows, ["k", "s", "v"])
    got = {r["col_name"]: r for r in profile(df).collect()}
    assert set(got) == {"k", "s", "v"}
    k = got["k"]
    assert (k["n"], k["n_null"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_val"], k["max_val"]) == ("1", "4")
    s = got["s"]
    assert (s["n_null"], s["n_distinct"]) == (1, 3)
    assert (s["min_val"], s["max_val"]) == ("a", "c")
    v = got["v"]
    assert (v["n_null"], v["n_distinct"]) == (1, 2)
    assert v["min_val"] == "5.0"


def test_profile_column_subset_and_approx(spark):
    from velesdb_spark.functions.stats import profile

    df = spark.createDataFrame([(i, i % 7) for i in range(1000)],
                               ["a", "b"])
    got = profile(df, columns=["b"], approx_distinct=True).collect()
    assert len(got) == 1 and got[0]["col_name"] == "b"
    # HLL at this cardinality is exact
    assert got[0]["n_distinct"] == 7


def test_profile_single_scan_plan(spark):
    from velesdb_spark.functions.stats import profile

    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    plan = profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_zipf_slope_shapes(spark):
    """A geometric frequency ladder has an exactly-computable slope;
    a uniform corpus fits slope ~0."""
    import math

    from velesdb_spark.functions.text_analysis import zipf_slope

    # freq(token_r) = 2^(10-r): ln f = ln(2^10) - r ln 2 over ln rank —
    # not linear in ln(rank), but monotone negative; check against a
    # NumPy fit of the same points instead of an analytic form
    import numpy as np

    rows = []
    doc = []
    for r in range(1, 9):
        doc.extend([f"tok{r}"] * (2 ** (9 - r)))
    rows.append((0, " ".join(doc)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = zipf_slope(df, top_n=8).collect()[0]
    xs = np.log(np.arange(1, 9))
    ys = np.log(np.array([2 ** (9 - r) for r in range(1, 9)], dtype=float))
    slope, intercept = np.polyfit(xs, ys, 1)
    assert got["n"] == 8
    assert got["slope"] == pytest.approx(slope, abs=1e-9)
    assert got["intercept"] == pytest.approx(intercept, abs=1e-9)

    uniform = spark.createDataFrame(
        [(0, " ".join(f"u{i}" for i in range(50)))], ["doc_id", "text"])
    flat = zipf_slope(uniform, top_n=50).collect()[0]
    # all counts equal → ln(freq) constant → slope exactly 0, r2 NULL
    assert flat["slope"] == pytest.approx(0.0, abs=1e-12)
    assert flat["r2"] is None

def test_profile_dotted_column_name(spark):
    """A legal top-level column name containing a dot must profile
    correctly (backtick-quoted read-back, not struct re-parse)."""
    from velesdb_spark.functions.stats import profile

    df = spark.createDataFrame([(1, "x"), (2, None), (2, "y")]) \
        .toDF("a.b", "c")
    got = {r["col_name"]: r for r in profile(df).collect()}
    assert got["a.b"]["n"] == 3
    assert got["a.b"]["n_null"] == 0
    assert got["a.b"]["n_distinct"] == 2
    assert got["c"]["n_null"] == 1


def test_profile_backtick_column_name(spark):
    """A legal column name containing a backtick must profile correctly
    (embedded backticks doubled in the quoted read-back — an unescaped
    one terminates the quote and misparses)."""
    from velesdb_spark.functions.stats import profile

    df = spark.createDataFrame([(1, "x"), (3, "y"), (3, None)]) \
        .toDF("a`b", "c`")
    got = {r["col_name"]: r for r in profile(df).collect()}
    assert got["a`b"]["n"] == 3
    assert got["a`b"]["n_distinct"] == 2
    assert got["a`b"]["min_val"] == "1"
    assert got["c`"]["n_null"] == 1

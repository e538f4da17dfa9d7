"""As-of join operator (operators/asof.py) — headroom beyond the
reference: point-in-time-correct temporal alignment via the union+window
plan (one shuffle, no range-join explosion)."""

import pytest
from pyspark.sql import functions as F

from velesdb_spark.operators.asof import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 205), (3, "u1", 300),
         (4, "u2", 150), (5, "u2", 90)],
        "event_id bigint, user string, t bigint")
    right = spark.createDataFrame(
        [("u1", 100, 1.0), ("u1", 200, 2.0), ("u1", 400, 4.0),
         ("u2", 100, 9.0)],
        "user string, t bigint, val double")
    return left, right


def test_asof_backward(spark, frames):
    left, right = frames
    out = {r.event_id: (r.val_right, r.t_right) for r in
           asof_join(left, right, on="t", by="user").collect()}
    assert out[1] == (1.0, 100)      # same-time right row IS visible
    assert out[2] == (2.0, 200)      # most recent prior
    assert out[3] == (2.0, 200)      # 400 is in the future
    assert out[4] == (9.0, 100)
    assert out[5] == (None, None)    # nothing at or before 90


def test_asof_forward_and_tolerance(spark, frames):
    left, right = frames
    fwd = {r.event_id: (r.val_right, r.t_right) for r in
           asof_join(left, right, on="t", by="user",
                     direction="forward").collect()}
    assert fwd[1] == (1.0, 100)
    assert fwd[2] == (4.0, 400)      # earliest at-or-after 205
    assert fwd[5] == (9.0, 100)
    tol = {r.event_id: (r.val_right, r.t_right) for r in
           asof_join(left, right, on="t", by="user",
                     tolerance_us=10).collect()}
    assert tol[1] == (1.0, 100)      # gap 0
    assert tol[2] == (2.0, 200)      # gap 5 within tolerance
    assert tol[3] == (None, None)    # gap 100 exceeds tolerance
    assert tol[5] == (None, None)    # unmatched stays unmatched


def test_asof_left_rows_preserved(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="t", by="user")
    assert out.count() == left.count()
    assert set(out.columns) == {"event_id", "user", "t",
                                "val_right", "t_right"}


def test_asof_matches_duckdb_native(spark):
    """Differential vs DuckDB's native ASOF JOIN on random data."""
    import random

    import duckdb

    rng = random.Random(11)
    left = [(i, f"u{rng.randrange(5)}", rng.randrange(0, 1000))
            for i in range(200)]
    right = [(f"u{rng.randrange(5)}", rng.randrange(0, 1000),
              round(rng.random(), 6)) for _ in range(100)]
    # unique (user, t) on the right so tie-break order can't differ
    seen, runiq = set(), []
    for u, t, v in right:
        if (u, t) not in seen:
            seen.add((u, t))
            runiq.append((u, t, v))
    ldf = spark.createDataFrame(left, "id bigint, u string, t bigint")
    rdf = spark.createDataFrame(runiq, "u string, t bigint, v double")
    got = {r.id: (r.v_right, r.t_right) for r in
           asof_join(ldf, rdf, on="t", by="u").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE l(id BIGINT, u VARCHAR, t BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", left)
    con.execute("CREATE TABLE r(u VARCHAR, t BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", runiq)
    want = {row[0]: (row[1], row[2]) for row in con.execute(
        "SELECT l.id, r.v, r.t FROM l ASOF LEFT JOIN r "
        "ON l.u = r.u AND l.t >= r.t").fetchall()}
    assert got == want

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


def test_asof_null_value_columns(spark):
    """Advisor r7: when the as-of-matched right row has a NULL value
    column, the NULL must be returned — not a value stitched from an
    older row. The struct carry guarantees all columns come from the
    same right row; differential vs DuckDB native ASOF with nulls."""
    import duckdb

    left = [(1, "u1", 150), (2, "u1", 250), (3, "u1", 350)]
    right = [("u1", 100, 1.0, "a"),
             ("u1", 200, None, "b"),     # NULL val at the matched row
             ("u1", 300, 3.0, None)]     # NULL tag at the matched row
    ldf = spark.createDataFrame(left, "id bigint, u string, t bigint")
    rdf = spark.createDataFrame(
        right, "u string, t bigint, v double, tag string")
    got = {r.id: (r.v_right, r.tag_right, r.t_right) for r in
           asof_join(ldf, rdf, on="t", by="u").collect()}
    assert got[1] == (1.0, "a", 100)
    assert got[2] == (None, "b", 200)    # NOT 1.0 from the older row
    assert got[3] == (3.0, None, 300)    # NOT "b" from the older row
    con = duckdb.connect()
    con.execute("CREATE TABLE l(id BIGINT, u VARCHAR, t BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", left)
    con.execute(
        "CREATE TABLE r(u VARCHAR, t BIGINT, v DOUBLE, tag VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?,?,?,?)", right)
    want = {row[0]: (row[1], row[2], row[3]) for row in con.execute(
        "SELECT l.id, r.v, r.tag, r.t FROM l ASOF LEFT JOIN r "
        "ON l.u = r.u AND l.t >= r.t").fetchall()}
    assert got == want


# ---------------------------------------------------- interval join

def test_interval_join_basic(spark):
    from velesdb_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame(
        [(1, "u1", 1000), (2, "u1", 5000), (3, "u2", 1000)],
        "id bigint, u string, t bigint")
    right = spark.createDataFrame(
        [(10, "u1", 900), (11, "u1", 1100), (12, "u1", 4000),
         (13, "u2", 2000), (14, "u1", 1000)],
        "rid bigint, u string, t bigint")
    out = interval_join(left, right, on="t", by="u",
                        lower_us=-200, upper_us=200)
    got = {(r.id, r.rid_right) for r in out.collect()}
    # id 1 (t=1000, ±200): right 900, 1100, 1000 — same user only
    assert got == {(1, 10), (1, 11), (1, 14)}
    # asymmetric window: only backward
    back = interval_join(left, right, on="t", by="u",
                         lower_us=-1200, upper_us=0)
    gb = {(r.id, r.rid_right) for r in back.collect()}
    assert gb == {(1, 10), (1, 14), (2, 12)}
    with pytest.raises(ValueError):
        interval_join(left, right, on="t", lower_us=5, upper_us=-5)


def test_interval_join_matches_duckdb_inequality(spark):
    """Randomized differential vs DuckDB's inequality join; also proves
    no duplicate pairs from the bucket probing."""
    import random

    import duckdb

    from velesdb_spark.operators.rangejoin import interval_join

    rng = random.Random(23)
    left = [(i, f"u{rng.randrange(4)}", rng.randrange(0, 5000))
            for i in range(300)]
    right = [(1000 + i, f"u{rng.randrange(4)}", rng.randrange(0, 5000))
             for i in range(300)]
    ldf = spark.createDataFrame(left, "id bigint, u string, t bigint")
    rdf = spark.createDataFrame(right, "rid bigint, u string, t bigint")
    rows = interval_join(ldf, rdf, on="t", by="u",
                         lower_us=-250, upper_us=100).collect()
    got = sorted((r.id, r.rid_right) for r in rows)
    assert len(got) == len(set(got))          # exactly-once per pair
    con = duckdb.connect()
    con.execute("CREATE TABLE l(id BIGINT, u VARCHAR, t BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", left)
    con.execute("CREATE TABLE r(rid BIGINT, u VARCHAR, t BIGINT)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", right)
    want = sorted((a, b) for a, b in con.execute(
        "SELECT l.id, r.rid FROM l JOIN r ON l.u = r.u "
        "AND r.t BETWEEN l.t - 250 AND l.t + 100").fetchall())
    assert got == want


def test_interval_join_large_magnitude_times(spark):
    """Advisor r7: bucket ids must be exact for longs at/beyond 2^53,
    where floor over double division can flip by one and silently drop
    a true match despite the exact range filter."""
    from velesdb_spark.operators.rangejoin import interval_join

    base = 1 << 60
    # pairs that straddle a bucket boundary at huge magnitudes, plus a
    # negative-time pair (floor vs truncate-toward-zero divergence)
    left = [(1, base + 1), (2, base + 1_000_003), (3, -base - 7)]
    right = [(10, base + 50), (11, base + 1_000_050), (12, -base - 40)]
    ldf = spark.createDataFrame(left, "id bigint, t bigint")
    rdf = spark.createDataFrame(right, "rid bigint, t bigint")
    got = {(r.id, r.rid_right) for r in
           interval_join(ldf, rdf, on="t",
                         lower_us=-100, upper_us=100).collect()}
    want = {(i, ri) for i, lt in left for ri, rt in right
            if lt - 100 <= rt <= lt + 100}
    assert got == want and len(want) == 3


# ---------------------------------------------------- funnel

def test_funnel_greedy_ordering(spark):
    from velesdb_spark.operators.funnel import funnel

    rows = [
        # u1 completes view(10) -> click(20) -> buy(30)
        ("u1", "view", 10), ("u1", "click", 20), ("u1", "buy", 30),
        # u2: click BEFORE view, no click after -> incomplete
        ("u2", "click", 5), ("u2", "view", 10), ("u2", "buy", 30),
        # u3: greedy must NOT die on the early view: view(1) click(2)
        # buy(100); also a later view(50) that would miss the buy if
        # greedy picked it — earliest-first keeps the chain alive
        ("u3", "view", 1), ("u3", "click", 2), ("u3", "view", 50),
        ("u3", "buy", 100),
        # u4: same-timestamp chain only
        ("u4", "view", 7), ("u4", "click", 7), ("u4", "buy", 7),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts bigint")
    got = {r.user_id: (r.t0, r.t1, r.t2) for r in
           funnel(df, ["view", "click", "buy"], on="ts").collect()}
    assert got == {"u1": (10, 20, 30), "u3": (1, 2, 100)}
    loose = {r.user_id for r in
             funnel(df, ["view", "click", "buy"], on="ts",
                    strict_increase=False).collect()}
    assert loose == {"u1", "u3", "u4"}
    within = {r.user_id for r in
              funnel(df, ["view", "click", "buy"], on="ts",
                     within_us=50).collect()}
    assert within == {"u1"}          # u3's only chain spans 99 > 50


def test_funnel_within_window_any_start(spark):
    """Advisor r7: within_us is windowed-funnel existence — a key
    qualifies when ANY ordered chain fits the window, not just the
    greedy-earliest chain. view@0 view@100 click@101 within=5 must
    qualify via the @100 start (greedy-from-0 spans 101)."""
    from velesdb_spark.operators.funnel import funnel

    rows = [("u1", "view", 0), ("u1", "view", 100), ("u1", "click", 101),
            # u2: no chain fits — clicks are 90+ after every view
            ("u2", "view", 0), ("u2", "view", 5), ("u2", "click", 95),
            # u3: later click would fit from a later view, 3 steps
            ("u3", "view", 0), ("u3", "click", 50), ("u3", "buy", 60),
            ("u3", "view", 49)]
    df = spark.createDataFrame(
        rows, "user_id string, event_type string, ts bigint")
    got = {r.user_id: (r.t0, r.t1) for r in
           funnel(df, ["view", "click"], on="ts",
                  within_us=5).collect()}
    # earliest QUALIFYING start per key (u1's @0 start does not fit)
    assert got == {"u1": (100, 101), "u3": (49, 50)}
    g3 = {r.user_id: (r.t0, r.t1, r.t2) for r in
          funnel(df, ["view", "click", "buy"], on="ts",
                 within_us=15).collect()}
    assert g3 == {"u3": (49, 50, 60)}
    # without the cap, greedy still returns the canonical earliest chain
    g0 = {r.user_id: (r.t0, r.t1, r.t2) for r in
          funnel(df, ["view", "click", "buy"], on="ts").collect()}
    assert g0 == {"u3": (0, 50, 60)}


def test_funnel_matches_bruteforce(spark):
    """Randomized differential vs a driver-side brute force that tries
    EVERY ordered triple — proves the greedy DP is exact for
    existence and finds the canonical earliest chain."""
    import itertools
    import random

    from velesdb_spark.operators.funnel import funnel

    rng = random.Random(31)
    types = ["a", "b", "c", "x"]
    rows = [(f"u{rng.randrange(12)}", rng.choice(types),
             rng.randrange(0, 50)) for _ in range(400)]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts bigint")
    got = {r.user_id: (r.t0, r.t1, r.t2) for r in
           funnel(df, ["a", "b", "c"], on="ts").collect()}
    by_user: dict = {}
    for u, t, ts in rows:
        by_user.setdefault(u, []).append((t, ts))
    want = {}
    for u, evs in by_user.items():
        best = None
        aa = sorted(ts for t, ts in evs if t == "a")
        bb = sorted(ts for t, ts in evs if t == "b")
        cc = sorted(ts for t, ts in evs if t == "c")
        for ta, tb, tc in itertools.product(aa, bb, cc):
            if ta < tb < tc:
                cand = (ta, tb, tc)
                best = cand if best is None or cand < best else best
        if best is not None:
            # greedy canonical chain: earliest a, earliest b after it,
            # earliest c after that
            ta = aa[0]
            tb = next(t for t in bb if t > ta)
            tc = next(t for t in cc if t > tb)
            want[u] = (ta, tb, tc)
    assert set(got) == set(want)
    assert got == want

    # windowed variants (advisor r7): any-start existence + greedy
    # chain from the earliest qualifying start, vs the same brute force
    def greedy_from(ta, bb, cc):
        tb = next((t for t in bb if t > ta), None)
        if tb is None:
            return None
        tc = next((t for t in cc if t > tb), None)
        return None if tc is None else (ta, tb, tc)

    for w in (3, 10, 25):
        got_w = {r.user_id: (r.t0, r.t1, r.t2) for r in
                 funnel(df, ["a", "b", "c"], on="ts",
                        within_us=w).collect()}
        want_w = {}
        for u, evs in by_user.items():
            aa = sorted(ts for t, ts in evs if t == "a")
            bb = sorted(ts for t, ts in evs if t == "b")
            cc = sorted(ts for t, ts in evs if t == "c")
            for ta in aa:
                chain = greedy_from(ta, bb, cc)
                if chain is not None and chain[2] - chain[0] <= w:
                    want_w[u] = chain
                    break
        assert got_w == want_w, w


# ---------------------------------------------------- snapshot diff

def test_snapshot_diff(spark):
    from velesdb_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id bigint, txt string, v bigint")
    new = spark.createDataFrame(
        [(2, "b", 20),          # unchanged
         (3, "c2", 30),         # changed (txt)
         (4, None, 40),         # unchanged (null-safe!)
         (5, "e", 50)],         # added
        "id bigint, txt string, v bigint")
    got = {r.id: r.change_type for r in
           snapshot_diff(old, new, "id").collect()}
    assert got == {1: "removed", 3: "changed", 5: "added"}
    full = {r.id: r.change_type for r in
            snapshot_diff(old, new, "id",
                          include_unchanged=True).collect()}
    assert full[2] == "unchanged" and full[4] == "unchanged"
    # restrict comparison: txt-only change invisible when comparing v
    vonly = {r.id: r.change_type for r in
             snapshot_diff(old, new, "id",
                           compare_cols=["v"]).collect()}
    assert 3 not in vonly


# ------------------------------------------------- physical-plan shape

def test_new_operators_plan_shapes(spark):
    """The 100-TB contracts, asserted on the physical plan:
    - asof_join contains NO join operator at all (union + one window);
    - interval_join never degenerates to BroadcastNestedLoop/cartesian;
    - weighted_sample_topk is TakeOrderedAndProject, not a full sort."""
    from velesdb_spark.functions.sampling import weighted_sample_topk
    from velesdb_spark.operators.asof import asof_join
    from velesdb_spark.operators.rangejoin import interval_join

    left = spark.createDataFrame(
        [(i, f"u{i % 7}", i * 37 % 1000) for i in range(300)],
        "id bigint, u string, t bigint")
    right = spark.createDataFrame(
        [(1000 + i, f"u{i % 7}", i * 53 % 1000, float(i)) for i in range(300)],
        "rid bigint, u string, t bigint, v double")

    asof_plan = asof_join(left, right.select("u", "t", "v"), on="t",
                          by="u")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in asof_plan          # no join operator anywhere
    assert "Window" in asof_plan

    rj_plan = interval_join(left, right, on="t", by="u",
                            lower_us=-50, upper_us=50) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in rj_plan
    assert "CartesianProduct" not in rj_plan

    ws_plan = weighted_sample_topk(
        left.withColumn("w", F.lit(5)), 10, "w", "id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in ws_plan


def test_temporal_operators_multiconfig_fuzz(spark):
    """Differential fuzz across randomized configs: asof backward AND
    forward vs DuckDB native ASOF; interval_join across window shapes
    (backward-only, forward-only, straddling, degenerate point) vs
    BETWEEN joins. One Spark session, many configs — catches boundary
    conventions a single fixed case would miss."""
    import random

    import duckdb

    from velesdb_spark.operators.asof import asof_join
    from velesdb_spark.operators.rangejoin import interval_join

    rng = random.Random(97)
    left = [(i, f"u{rng.randrange(6)}", rng.randrange(0, 800))
            for i in range(250)]
    right_raw = [(f"u{rng.randrange(6)}", rng.randrange(0, 800),
                  round(rng.random(), 6)) for _ in range(150)]
    seen, right = set(), []
    for u, t, v in right_raw:
        if (u, t) not in seen:
            seen.add((u, t))
            right.append((u, t, v))
    ldf = spark.createDataFrame(left, "id bigint, u string, t bigint")
    rdf = spark.createDataFrame(right, "u string, t bigint, v double")
    con = duckdb.connect()
    con.execute("CREATE TABLE l(id BIGINT, u VARCHAR, t BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", left)
    con.execute("CREATE TABLE r(u VARCHAR, t BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", right)

    for direction, op in (("backward", ">="), ("forward", "<=")):
        got = {r.id: (r.v_right, r.t_right) for r in
               asof_join(ldf, rdf, on="t", by="u",
                         direction=direction).collect()}
        want = {row[0]: (row[1], row[2]) for row in con.execute(
            f"SELECT l.id, r.v, r.t FROM l ASOF LEFT JOIN r "
            f"ON l.u = r.u AND l.t {op} r.t").fetchall()}
        assert got == want, direction

    for lo, hi in ((-100, -10), (10, 100), (-60, 60), (0, 0), (-1, 1)):
        got = sorted((r.id, r.t_right) for r in
                     interval_join(ldf, rdf, on="t", by="u",
                                   lower_us=lo, upper_us=hi).collect())
        assert len(got) == len(set(got)), (lo, hi)
        want = sorted(con.execute(
            f"SELECT l.id, r.t FROM l JOIN r ON l.u = r.u "
            f"AND r.t BETWEEN l.t + ({lo}) AND l.t + ({hi})").fetchall())
        assert got == want, (lo, hi)


def test_bucket_gapfill_semantics(spark):
    """Dense per-group spine: missing buckets zero-filled with LOCF
    averages; each group's range is its OWN [min, max] (group b must not
    inherit group a's span); gap_filled flags exactly the empty ones."""
    from pyspark.sql import functions as F

    from velesdb_spark.operators.gapfill import bucket_gapfill

    rows = [
        # group a: buckets 00:00, 01:00 empty, 02:00
        (1, "2024-03-01 00:10:00", "a", 10.0),
        (2, "2024-03-01 00:50:00", "a", 30.0),
        (3, "2024-03-01 02:15:00", "a", 50.0),
        # group b: single bucket at 05:00 (no gaps, no spine bleed)
        (4, "2024-03-01 05:30:00", "b", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts_s string, event_type string, "
              "value double") \
        .select("event_id", F.to_timestamp("ts_s").alias("ts"),
                "event_type", "value")
    out = bucket_gapfill(df, "1 hour").collect()
    got = {(r.event_type, r.bucket_start.hour):
           (r.n, r.sum_value, r.locf_avg, r.gap_filled) for r in out}
    assert got == {
        ("a", 0): (2, 40.0, 20.0, False),
        ("a", 1): (0, 0.0, 20.0, True),    # zero-filled, LOCF carries
        ("a", 2): (1, 50.0, 50.0, False),
        ("b", 5): (1, 7.0, 7.0, False),
    }
    assert len(out) == 4  # no spine bleed across groups

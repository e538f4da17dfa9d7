"""Plan-shape contracts for the round-11 staging fixes.

The round-11 optimization class: a small derived frame consumed by k > 1
branches of one query is planned k times by Catalyst (0 ReusedExchange),
re-running the expensive upstream (events scan + dedup shuffle, the
accumulated funnel chain, the per-customer orders aggregate) once per
consumer. The fix stages (persists) the small fixed-width working set so
the upstream executes once. These tests pin the resulting top-level
optimized-plan shape — if a refactor drops a stage() call, the duplicate
parquet relations reappear and the contract fails.

Counting convention: a staged subtree shows as InMemoryRelation; its
build plan (with the real parquet scan) is NOT expanded in
optimizedPlan().toString(), so top-level `Relation ... parquet` leaves
count only the UNSTAGED scans.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _leaves(df):
    lines = df._jdf.queryExecution().optimizedPlan().toString().splitlines()
    stripped = [l.lstrip(" :+-") for l in lines]
    rel = [l for l in stripped if l.startswith("Relation")]
    imr = [l for l in stripped if l.startswith("InMemoryRelation")]
    return rel, imr


@pytest.fixture(scope="module")
def gate_queries():
    import __spark_entry__ as e

    return e.queries()


@pytest.fixture(autouse=True)
def _release():
    yield
    from velesdb_spark.functions import staging

    staging.release_staged()


def test_events_funnel_staging_contract(spark, gate_queries):
    """operators/funnel.py stages each step accumulator (consumed by
    both the next step's filter-join and the chain join): only the LAST
    step's events scan stays a top-level parquet relation — one scan per
    step total instead of ~2x per level (7 -> 3 at three steps)."""
    rel, imr = _leaves(gate_queries["events_funnel"](spark, SF_DIR))
    events_rel = [l for l in rel if "event_type" in l]
    assert len(events_rel) == 1, \
        f"funnel re-plans the events scan per consumer: {rel}"
    assert imr, "funnel accumulator staging dropped (no InMemoryRelation)"


def test_events_retention_staging_contract(spark, gate_queries):
    """operators/retention.py stages the distinct (user, bucket)
    activity projection and the per-user cohort aggregate; every branch
    (cohorts, cells, sizes) reads the cache — zero top-level parquet
    scans of events remain (3 -> 1, with the one scan inside the
    activity cache build)."""
    rel, imr = _leaves(gate_queries["events_retention"](spark, SF_DIR))
    assert rel == [], \
        f"retention re-plans the events scan per consumer: {rel}"
    assert len(imr) >= 2, \
        f"activity/cohorts staging dropped: {imr}"


def test_correlated_subquery_scan_contract(spark, gate_queries):
    """__spark_entry__ _correlated: the exists + count_zero legs share
    ONE customer scan (left join + 2-slot flag-array explode), the
    scalar + corr_in legs share ONE orders scan, and the per-customer
    aggregate is staged — exactly one customer and one orders relation
    at top level."""
    rel, imr = _leaves(gate_queries["correlated_subquery"](spark, SF_DIR))
    cust = [l for l in rel if "c_custkey" in l]
    orders = [l for l in rel if "o_orderkey" in l]
    assert len(cust) == 1, f"customer scanned {len(cust)}x: {rel}"
    assert len(orders) == 1, f"orders scanned {len(orders)}x: {rel}"
    assert imr, "per_cust staging dropped (no InMemoryRelation)"

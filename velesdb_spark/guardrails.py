"""Guard-rails, quotas & timeouts for queries.

Reference: crates/velesdb-core/src/guardrails.rs (EPIC-048) — QueryLimits
(max_depth 10, max_cardinality 100k, memory 100 MiB, timeout 30 s, rate
100 qps, circuit threshold 5 / recovery 30 s), QueryContext check_*
methods, per-client token-bucket RateLimiter, Closed/Open/HalfOpen
CircuitBreaker, and a GuardRails facade with pre_check.

Spark integration: ``guarded_collect`` runs an action inside a job group
with a watchdog that cancels the group at the timeout (the distributed
analogue of the reference's per-query deadline), enforces the cardinality
limit with a limit(n+1) probe instead of a full count, and feeds the
circuit breaker. Memory budgeting maps to Spark's own spill/maxResultSize
machinery; check_memory remains for driver-side accounting parity.

Clocks are injectable everywhere so the state machines are unit-testable
without sleeping.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Callable, Optional

DEFAULT_MAX_DEPTH = 10
DEFAULT_MAX_CARDINALITY = 100_000
DEFAULT_MEMORY_LIMIT_BYTES = 100 * 1024 * 1024
DEFAULT_TIMEOUT_MS = 30_000
DEFAULT_RATE_LIMIT_QPS = 100
DEFAULT_CIRCUIT_FAILURE_THRESHOLD = 5
DEFAULT_CIRCUIT_RECOVERY_SECONDS = 30


class GuardRailViolation(Exception):
    """Base for all guard-rail rejections (guardrails.rs error enum)."""


class TimeoutExceeded(GuardRailViolation):
    pass


class DepthExceeded(GuardRailViolation):
    pass


class CardinalityExceeded(GuardRailViolation):
    pass


class MemoryExceeded(GuardRailViolation):
    pass


class RateLimitExceeded(GuardRailViolation):
    pass


class CircuitOpen(GuardRailViolation):
    def __init__(self, recovery_in_seconds: float):
        super().__init__(f"circuit open; recovery in {recovery_in_seconds:.0f}s")
        self.recovery_in_seconds = recovery_in_seconds


@dataclass
class QueryLimits:
    max_depth: int = DEFAULT_MAX_DEPTH
    max_cardinality: int = DEFAULT_MAX_CARDINALITY
    memory_limit_bytes: int = DEFAULT_MEMORY_LIMIT_BYTES
    timeout_ms: int = DEFAULT_TIMEOUT_MS
    rate_limit_qps: int = DEFAULT_RATE_LIMIT_QPS
    circuit_failure_threshold: int = DEFAULT_CIRCUIT_FAILURE_THRESHOLD
    circuit_recovery_seconds: int = DEFAULT_CIRCUIT_RECOVERY_SECONDS

    def with_max_depth(self, depth: int) -> "QueryLimits":
        self.max_depth = depth
        return self

    def with_max_cardinality(self, cardinality: int) -> "QueryLimits":
        self.max_cardinality = cardinality
        return self

    def with_memory_limit(self, bytes_: int) -> "QueryLimits":
        self.memory_limit_bytes = bytes_
        return self

    def with_timeout_ms(self, ms: int) -> "QueryLimits":
        self.timeout_ms = ms
        return self


class QueryContext:
    """Per-query limit enforcement (guardrails.rs QueryContext)."""

    def __init__(self, limits: QueryLimits,
                 clock: Callable[[], float] = time.monotonic):
        self.limits = limits
        self._clock = clock
        self.start_time = clock()
        self._memory_used = 0

    def elapsed_s(self) -> float:
        return self._clock() - self.start_time

    def check_timeout(self) -> None:
        if self.elapsed_s() * 1000 > self.limits.timeout_ms:
            raise TimeoutExceeded(
                f"query exceeded {self.limits.timeout_ms} ms")

    def check_depth(self, depth: int) -> None:
        if depth > self.limits.max_depth:
            raise DepthExceeded(
                f"depth {depth} > max {self.limits.max_depth}")

    def check_cardinality(self, count: int) -> None:
        if count > self.limits.max_cardinality:
            raise CardinalityExceeded(
                f"cardinality {count} > max {self.limits.max_cardinality}")

    def check_memory(self, bytes_: int) -> None:
        self._memory_used += bytes_
        if self._memory_used > self.limits.memory_limit_bytes:
            raise MemoryExceeded(
                f"memory {self._memory_used} > "
                f"max {self.limits.memory_limit_bytes}")

    def memory_used(self) -> int:
        return self._memory_used


class RateLimiter:
    """Per-client token bucket (guardrails.rs RateLimiter): bucket starts
    full at ``limit_qps`` tokens, refills at limit_qps/s capped at the
    limit, each request consumes one token."""

    def __init__(self, limit_qps: int,
                 clock: Callable[[], float] = time.monotonic):
        self.limit_qps = limit_qps
        self._clock = clock
        self._clients: dict[str, list[float]] = {}  # [tokens, last_update]
        self._lock = threading.Lock()

    def check(self, client_id: str) -> None:
        with self._lock:
            now = self._clock()
            limit = float(self.limit_qps)
            bucket = self._clients.setdefault(client_id, [limit, now])
            elapsed = now - bucket[1]
            bucket[0] = min(bucket[0] + elapsed * limit, limit)
            bucket[1] = now
            if bucket[0] >= 1.0:
                bucket[0] -= 1.0
            else:
                raise RateLimitExceeded(
                    f"rate limit {self.limit_qps} qps exceeded")


class CircuitState:
    CLOSED = "closed"
    OPEN = "open"
    HALF_OPEN = "half_open"


class CircuitBreaker:
    """Closed → (threshold consecutive failures) → Open → (recovery
    elapses) → HalfOpen → success closes / failure reopens
    (guardrails.rs CircuitBreaker)."""

    def __init__(self, failure_threshold: int, recovery_seconds: float,
                 clock: Callable[[], float] = time.monotonic):
        self.failure_threshold = failure_threshold
        self.recovery_seconds = recovery_seconds
        self._clock = clock
        self._state = CircuitState.CLOSED
        self._failures = 0
        self._opened_at: Optional[float] = None
        self._lock = threading.Lock()

    def check(self) -> None:
        with self._lock:
            if self._state != CircuitState.OPEN:
                return
            elapsed = self._clock() - (self._opened_at or 0.0)
            if elapsed >= self.recovery_seconds:
                self._state = CircuitState.HALF_OPEN
                return
            raise CircuitOpen(self.recovery_seconds - elapsed)

    def record_success(self) -> None:
        with self._lock:
            self._failures = 0
            if self._state == CircuitState.HALF_OPEN:
                self._state = CircuitState.CLOSED

    def record_failure(self) -> None:
        with self._lock:
            self._failures += 1
            if self._failures >= self.failure_threshold and \
                    self._state in (CircuitState.CLOSED,
                                    CircuitState.HALF_OPEN):
                self._state = CircuitState.OPEN
                self._opened_at = self._clock()

    def state(self) -> str:
        return self._state


class GuardRails:
    """Facade (guardrails.rs GuardRails): shared rate limiter + circuit
    breaker, per-query contexts."""

    def __init__(self, limits: Optional[QueryLimits] = None,
                 clock: Callable[[], float] = time.monotonic):
        self.limits = limits or QueryLimits()
        self.rate_limiter = RateLimiter(self.limits.rate_limit_qps, clock)
        self.circuit_breaker = CircuitBreaker(
            self.limits.circuit_failure_threshold,
            self.limits.circuit_recovery_seconds, clock)
        self._clock = clock

    def create_context(self) -> QueryContext:
        return QueryContext(self.limits, self._clock)

    def pre_check(self, client_id: str) -> None:
        self.circuit_breaker.check()
        self.rate_limiter.check(client_id)


def guarded_collect(df, limits: Optional[QueryLimits] = None,
                    rails: Optional[GuardRails] = None,
                    client_id: str = "default"):
    """Run a DataFrame action under guard-rails: rate/circuit pre-check, a
    watchdog that cancels the query's job group at the timeout, and a
    limit(n+1) cardinality probe (no full count of an oversized result).
    Successes/failures feed the circuit breaker."""
    rails = rails or GuardRails(limits or QueryLimits())
    rails.pre_check(client_id)
    ctx = rails.create_context()
    lim = rails.limits
    sc = df.sparkSession.sparkContext
    group = f"guarded-{id(df)}-{threading.get_ident()}"
    done = threading.Event()

    def watchdog():
        if not done.wait(lim.timeout_ms / 1000.0):
            sc.cancelJobGroup(group)

    sc.setJobGroup(group, "guarded_collect", interruptOnCancel=True)
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        rows = df.limit(lim.max_cardinality + 1).collect()
        done.set()
        ctx.check_timeout()
        ctx.check_cardinality(len(rows))
    except GuardRailViolation:
        rails.circuit_breaker.record_failure()
        raise
    except Exception as e:
        done.set()
        rails.circuit_breaker.record_failure()
        ctx_timeout = ctx.elapsed_s() * 1000 >= lim.timeout_ms
        if ctx_timeout:
            raise TimeoutExceeded(
                f"query cancelled after {lim.timeout_ms} ms") from e
        raise
    finally:
        done.set()
        sc.setJobGroup("", "")
    rails.circuit_breaker.record_success()
    return rows

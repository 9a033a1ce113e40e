"""Rate-limited REST API source as a ``mapInPandas`` enrichment stage
(SURVEY §2.1 S3-S8, §2.12).

The reference fetches Riot API data driver-side, one call at a time, under
a sliding-window budget (``AdvancedRateLimiter``, 100 req/120 s personal +
500/600 s method — ``Utils/api.py:132-167``) with exponential backoff and
error-row sentinels on retry exhaustion (``Utils/api.py:222-321``).

The Spark-first shape: the *request parameters* are a DataFrame; the fetch
runs inside ``mapInPandas`` so each partition holds one rate limiter and
the global rate is bounded by ``partition_count × per_partition_budget``.
Results come back as columns (payload + status + error sentinel), so F2/F3
filtering and P12 error substitution stay relational.

No live HTTP in this environment: ``fetch_fn`` is injected. The default
``simulated_fetch`` is deterministic (md5-derived payloads + deterministic
429s on a subset of keys) so the whole source is DuckDB-oracle-checkable.
"""

from __future__ import annotations

import hashlib
import random
import time
from collections import deque
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

RESULT_SCHEMA = "request_key string, status bigint, payload string, error string"


class SlidingWindowRateLimiter:
    """Sliding-window request budget (Utils/api.py:132-167 semantics):
    at most ``max_requests`` per ``window_seconds``, else sleep until the
    oldest request ages out. One instance per partition."""

    def __init__(self, max_requests: int, window_seconds: float):
        self.max_requests = max_requests
        self.window_seconds = window_seconds
        self._times: deque[float] = deque()

    def acquire(self) -> None:
        now = time.monotonic()
        while self._times and now - self._times[0] >= self.window_seconds:
            self._times.popleft()
        if len(self._times) >= self.max_requests:
            sleep_for = self.window_seconds - (now - self._times[0])
            if sleep_for > 0:
                time.sleep(sleep_for)
            self._times.popleft()
        self._times.append(time.monotonic())


class CircuitBreaker:
    """Failure-threshold circuit breaker (Utils/api.py:170-199 semantics):
    CLOSED until ``failure_threshold`` consecutive failures, then OPEN
    (requests short-circuit without hitting the endpoint) until
    ``recovery_timeout`` elapses, then HALF_OPEN (one probe allowed —
    success closes the circuit, failure re-opens it).

    One instance per partition (like the rate limiter): the global
    behavior is "each executor slice stops hammering a flaky endpoint",
    which is the property that matters — a cluster-global breaker would
    need a side channel and buys nothing beyond that.

    ``clock`` is injectable for deterministic tests.
    """

    def __init__(self, failure_threshold: int = 5, recovery_timeout: float = 60.0,
                 clock: Callable[[], float] = time.monotonic):
        self.failure_threshold = failure_threshold
        self.recovery_timeout = recovery_timeout
        self.clock = clock
        self.failure_count = 0
        self.last_failure_time: float | None = None
        self.state = "CLOSED"

    def can_execute(self) -> bool:
        if self.state == "OPEN":
            if self.clock() - self.last_failure_time > self.recovery_timeout:
                self.state = "HALF_OPEN"
                return True
            return False
        return True  # CLOSED or HALF_OPEN probe

    def on_success(self) -> None:
        self.failure_count = 0
        self.state = "CLOSED"

    def on_failure(self) -> None:
        self.failure_count += 1
        self.last_failure_time = self.clock()
        if self.failure_count >= self.failure_threshold:
            self.state = "OPEN"


def simulated_fetch(key: str, attempt: int) -> tuple[int, str | None]:
    """Deterministic fake of the Riot API: payload fields derive from
    md5(key); keys whose digest starts with hex 'f' 429 on the first
    attempt and succeed on retry (exercising the backoff path); digest
    prefix 'ff' is a permanent 429 (error-row sentinel, P12)."""
    digest = hashlib.md5(key.encode()).hexdigest()
    if digest.startswith("ff"):
        return 429, None
    if digest.startswith("f") and attempt == 0:
        return 429, None
    level = int(digest[:2], 16)
    return 200, f'{{"championLevel": {level}, "digest": "{digest}"}}'


def live_http_fetch(
    url_for_key: Callable[[str], str],
    headers: dict[str, str] | None = None,
    timeout: float = 10.0,
) -> Callable[[str, int], tuple[int, str | None]]:
    """Live-HTTP implementation of the injected ``fetch_fn`` interface —
    the piece a real deployment plugs into :func:`http_source` where this
    sandbox uses :func:`simulated_fetch`.

    Mirrors the reference's request semantics (``Utils/api.py:61-103``):
    the HTTP status code is returned as-is so :func:`http_source`'s
    ladder applies (200 → payload row, ≥429 → retry with backoff then
    error-sentinel row, 400-428 → non-retried error row). A transport
    failure (connection refused, DNS, timeout) maps to status 599 —
    retryable, like a 5xx — because the endpoint may just be restarting.

    Built on stdlib ``urllib`` so the engine adds no dependency; the
    callable closes over plain data (URL template, headers, timeout) and
    ships to executors via cloudpickle. For connection pooling at high
    request rates, swap in a ``requests.Session``-backed callable with
    the same signature — one session per partition comes free because
    ``http_source`` builds partition-local state anyway.
    """
    import urllib.error
    import urllib.request

    def fetch(key: str, attempt: int) -> tuple[int, str | None]:
        req = urllib.request.Request(url_for_key(key), headers=headers or {})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.status, resp.read().decode("utf-8", "replace")
        except urllib.error.HTTPError as exc:
            exc.read()  # drain so the connection can be reused
            return exc.code, None
        except (urllib.error.URLError, TimeoutError, OSError):
            return 599, None

    return fetch


def http_source(
    params: DataFrame,
    key_col: str,
    fetch_fn: Callable[[str, int], tuple[int, str | None]] = simulated_fetch,
    max_retries: int = 3,
    max_requests_per_window: int = 1000,
    window_seconds: float = 120.0,
    backoff_base: float = 0.0,  # real deployments: 1.0 → min(60, 2^attempt)
    breaker_factory: Callable[[], CircuitBreaker] | None = None,
    jitter: bool = False,
) -> DataFrame:
    """Fetch one payload per row of ``params`` under a per-partition rate
    limit. Returns (request_key, status, payload, error).

    Error semantics mirror the reference: ≥429 retried with exponential
    backoff (Utils/api.py:50-57); exhaustion yields an error-sentinel row
    ('Error429', Utils/api.py:228-239) instead of dropping the key.
    Backoff jitter (Utils/api.py:50-57 adds 10-30% per sleep) is behind
    the ``jitter`` flag, DEFAULT OFF: the deterministic delay
    (``min(60, base * 2^attempt)``) keeps the simulated fetch
    oracle-reproducible. Production deployments pass ``jitter=True`` to
    de-synchronize retry storms across executors — jitter only perturbs
    SLEEP DURATIONS, never payloads, so results stay deterministic
    either way.

    ``breaker_factory`` (e.g. ``CircuitBreaker``) enables the reference's
    failure-threshold circuit breaker (Utils/api.py:170-199): while the
    per-partition breaker is OPEN, keys short-circuit to a
    ``CircuitOpen`` sentinel row without touching the endpoint. Off by
    default so the deterministic simulated source stays oracle-stable;
    real deployments pass ``breaker_factory=CircuitBreaker``.
    """

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        limiter = SlidingWindowRateLimiter(max_requests_per_window, window_seconds)
        breaker = breaker_factory() if breaker_factory else None
        for pdf in batches:
            keys, statuses, payloads, errors = [], [], [], []
            for key in pdf[key_col].astype(str):
                status, payload, short_circuited = 0, None, False
                for attempt in range(max_retries + 1):
                    if breaker and not breaker.can_execute():
                        short_circuited = True
                        break
                    limiter.acquire()
                    status, payload = fetch_fn(key, attempt)
                    if status < 429:
                        if breaker:
                            breaker.on_success()
                        break
                    if breaker:
                        breaker.on_failure()
                    if backoff_base:
                        delay = min(60.0, backoff_base * (2 ** attempt))
                        if jitter:
                            delay *= 1.0 + random.uniform(0.1, 0.3)
                        time.sleep(delay)
                keys.append(key)
                statuses.append(status)
                payloads.append(payload)
                if short_circuited:
                    errors.append("CircuitOpen")
                else:
                    errors.append(None if status == 200 else f"Error{status}")
            yield pd.DataFrame({"request_key": keys, "status": statuses,
                                "payload": payloads, "error": errors})

    return params.mapInPandas(fetch_partition, RESULT_SCHEMA)

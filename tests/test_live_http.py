"""Live-HTTP adapter for the API source, exercised over real sockets.

The engine's :func:`http_source` injects ``fetch_fn``; production plugs in
:func:`live_http_fetch` (the reference performs real ``requests.get`` with
retry/backoff/429 handling — ``Utils/api.py:61-103,222-321``). These tests
run it against a local in-process ``http.server`` with scripted
200/429/500 sequences, proving retry-then-succeed, retry-exhaustion error
rows, circuit-breaker short-circuit/half-open-recovery, and transport-
failure mapping — all through the real ``mapInPandas`` execution path.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from league_of_legends_data_pipeline_spark.sources.api import (
    CircuitBreaker, http_source, live_http_fetch,
)


class _ScriptedHandler(BaseHTTPRequestHandler):
    """Each path follows a scripted status sequence; the LAST entry repeats
    forever. The server is single-threaded, so per-path counters are safe."""

    script: dict[str, list[int]] = {}
    hits: dict[str, int] = {}

    def do_GET(self):  # noqa: N802 — http.server API
        seq = self.script.get(self.path, [404])
        n = self.hits.get(self.path, 0)
        self.hits[self.path] = n + 1
        status = seq[min(n, len(seq) - 1)]
        body = json.dumps({"path": self.path, "attempt": n,
                           "status": status}).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr lines
        pass


@pytest.fixture()
def scripted_server():
    _ScriptedHandler.script = {
        "/ok": [200],
        "/flaky": [429, 429, 200],   # succeeds on 3rd attempt
        "/dead": [500],              # fails forever
        "/teapot": [418],            # 400-428: not retried
    }
    _ScriptedHandler.hits = {}
    server = HTTPServer(("127.0.0.1", 0), _ScriptedHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    thread.join(timeout=5)


def test_live_fetch_retry_and_exhaustion(spark, scripted_server):
    base = scripted_server
    df = spark.createDataFrame(
        [("/ok",), ("/flaky",), ("/dead",), ("/teapot",)], "key string"
    ).repartition(1)
    fetch = live_http_fetch(lambda key: base + key, timeout=5.0)
    rows = {r["request_key"]: r for r in
            http_source(df, "key", fetch_fn=fetch, max_retries=3).collect()}

    assert rows["/ok"]["status"] == 200 and rows["/ok"]["error"] is None
    assert json.loads(rows["/ok"]["payload"])["path"] == "/ok"

    # 429 twice, then 200: the retry loop must land on the success payload
    assert rows["/flaky"]["status"] == 200 and rows["/flaky"]["error"] is None
    assert json.loads(rows["/flaky"]["payload"])["attempt"] == 2

    # permanent 500: retries exhaust into an error-sentinel row (P12),
    # exactly max_retries + 1 socket hits
    assert rows["/dead"]["status"] == 500
    assert rows["/dead"]["error"] == "Error500"

    # 400-428 is a client error: no retry, no payload
    assert rows["/teapot"]["status"] == 418
    assert rows["/teapot"]["error"] == "Error418"


def test_live_fetch_hit_counts(scripted_server):
    """Driver-side check of the raw adapter: statuses pass through and the
    handler sees exactly the attempts the ladder implies."""
    base = scripted_server
    fetch = live_http_fetch(lambda key: base + key, timeout=5.0)
    assert fetch("/ok", 0)[0] == 200
    assert fetch("/dead", 0) == (500, None)
    assert fetch("/teapot", 0) == (418, None)
    assert _ScriptedHandler.hits == {"/ok": 1, "/dead": 1, "/teapot": 1}


def test_live_fetch_transport_failure_maps_to_599():
    # nothing listens on this port: connection refused → 599 (retryable)
    fetch = live_http_fetch(lambda key: f"http://127.0.0.1:9/{key}",
                            timeout=0.5)
    assert fetch("x", 0) == (599, None)


def test_live_fetch_circuit_breaker_over_sockets(spark, scripted_server):
    """Breaker opens during the dead key's retries; the next key
    short-circuits to a CircuitOpen sentinel without touching the socket."""
    base = scripted_server
    df = spark.createDataFrame([("/dead",), ("/ok",)], "key string") \
        .repartition(1).sortWithinPartitions("key")
    fetch = live_http_fetch(lambda key: base + key, timeout=5.0)
    rows = {r["request_key"]: r for r in http_source(
        df, "key", fetch_fn=fetch, max_retries=3,
        breaker_factory=lambda: CircuitBreaker(
            failure_threshold=2, recovery_timeout=3600.0),
    ).collect()}
    # the breaker opens DURING /dead's retries (threshold 2 < retries 4),
    # so its remaining attempts — and every later key — short-circuit
    assert rows["/dead"]["error"] == "CircuitOpen"
    assert rows["/ok"]["error"] == "CircuitOpen"
    assert _ScriptedHandler.hits.get("/ok") is None  # never reached the wire
    # breaker trips at the threshold: 2 socket hits, not max_retries+1
    assert _ScriptedHandler.hits["/dead"] == 2


def test_live_fetch_breaker_half_open_recovers(spark, scripted_server):
    """recovery_timeout=0: the breaker re-probes (HALF_OPEN) on the next
    key; a live endpoint closes the circuit and the suffix succeeds."""
    base = scripted_server
    df = spark.createDataFrame([("/dead",), ("/ok",)], "key string") \
        .repartition(1).sortWithinPartitions("key")
    fetch = live_http_fetch(lambda key: base + key, timeout=5.0)
    rows = {r["request_key"]: r for r in http_source(
        df, "key", fetch_fn=fetch, max_retries=1,
        breaker_factory=lambda: CircuitBreaker(
            failure_threshold=2, recovery_timeout=0.0),
    ).collect()}
    assert rows["/dead"]["error"] == "Error500"
    assert rows["/ok"]["status"] == 200 and rows["/ok"]["error"] is None

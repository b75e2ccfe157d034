"""OTLP/HTTP span exporter: real delivery to a local collector, graceful
self-disable when the collector is unreachable (ref behavior:
tracing_config.rs:39-111 — Jaeger pipeline with graceful fallback)."""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from amira_rust_asr_server_tpu.reliability import (OtlpHttpExporter,
                                                   request_span,
                                                   set_exporter)


class _Collector(BaseHTTPRequestHandler):
    received = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        _Collector.received.append((self.path, json.loads(body)))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture
def collector():
    _Collector.received = []
    server = HTTPServer(("127.0.0.1", 0), _Collector)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def _wait(pred, timeout=10.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.05)
    return False


def test_spans_delivered_otlp_json(collector):
    exp = OtlpHttpExporter(collector, flush_interval_s=0.1)
    exp.export_span("batch", 1_000, 2_000,
                    {"request_id": "abc", "model": "default",
                     "audio_s": 1.5, "n": 3, "deep": True})
    assert _wait(lambda: exp.exported == 1)
    exp.shutdown()

    path, body = _Collector.received[0]
    assert path == "/v1/traces"
    rs = body["resourceSpans"][0]
    attrs = {a["key"]: a["value"] for a in rs["resource"]["attributes"]}
    assert attrs["service.name"]["stringValue"] == "amira-asr-tpu-server"
    span = rs["scopeSpans"][0]["spans"][0]
    assert span["name"] == "batch"
    assert span["startTimeUnixNano"] == "1000"
    assert span["status"]["code"] == 1
    sattrs = {a["key"]: a["value"] for a in span["attributes"]}
    assert sattrs["model"] == {"stringValue": "default"}
    assert sattrs["audio_s"] == {"doubleValue": 1.5}
    assert sattrs["n"] == {"intValue": "3"}
    assert sattrs["deep"] == {"boolValue": True}
    assert len(span["traceId"]) == 32 and len(span["spanId"]) == 16


def test_request_span_exports(collector):
    exp = OtlpHttpExporter(collector, flush_interval_s=0.1)
    set_exporter(exp)
    try:
        with request_span("stream", model="m1"):
            pass
        with pytest.raises(ValueError):
            with request_span("stream", model="m2"):
                raise ValueError("boom")
        assert _wait(lambda: exp.exported == 2)
        spans = [s for _, b in _Collector.received
                 for rs in b["resourceSpans"]
                 for ss in rs["scopeSpans"] for s in ss["spans"]]
        by_model = {
            {a["key"]: a["value"] for a in s["attributes"]}
            ["model"]["stringValue"]: s for s in spans}
        assert by_model["m1"]["status"]["code"] == 1
        assert by_model["m2"]["status"]["code"] == 2  # error status
    finally:
        set_exporter(None)


def test_unreachable_collector_disables_gracefully():
    exp = OtlpHttpExporter("http://127.0.0.1:1", flush_interval_s=0.05,
                           max_failures=2, timeout_s=0.2)
    for i in range(4):
        exp.export_span(f"s{i}", 0, 1, {})
    assert _wait(lambda: exp.disabled, timeout=15)
    # disabled exporter sheds silently
    exp.export_span("after", 0, 1, {})
    assert exp.exported == 0
    exp.shutdown()

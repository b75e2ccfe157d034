"""Structured logging / tracing.

Parity role of the reference's tracing stack (ref:
src/reliability/tracing_config.rs:16-233): JSON structured logs, env-filter
style level control, span-like request context fields, and an optional
OpenTelemetry export hook that degrades gracefully when no collector or
SDK is present (the reference's Jaeger fallback behavior).
"""

from __future__ import annotations

import contextlib
import contextvars
import json
import logging
import os
import sys
import time
import uuid
from typing import Any, Dict, Iterator, Optional

_request_ctx: contextvars.ContextVar[Dict[str, Any]] = \
    contextvars.ContextVar("asr_request_ctx", default={})


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload: Dict[str, Any] = {
            "ts": round(record.created, 3),
            "level": record.levelname,
            "target": record.name,
            "message": record.getMessage(),
        }
        payload.update(_request_ctx.get())
        extra = getattr(record, "fields", None)
        if extra:
            payload.update(extra)
        if record.exc_info and record.exc_info[0]:
            payload["exception"] = self.formatException(record.exc_info)
        return json.dumps(payload, ensure_ascii=False)


def init_tracing(level: Optional[str] = None, json_logs: bool = True,
                 otel_endpoint: Optional[str] = None) -> logging.Logger:
    """Initialize the logging pipeline (ref: init_tracing,
    tracing_config.rs:39-111). Level from arg > ASR_LOG env > INFO."""
    level = (level or os.environ.get("ASR_LOG", "INFO")).upper()
    root = logging.getLogger("asr")
    root.handlers.clear()
    handler = logging.StreamHandler(sys.stdout)
    if json_logs:
        handler.setFormatter(JsonFormatter())
    else:
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s %(message)s"))
    root.addHandler(handler)
    root.setLevel(level)
    root.propagate = False
    if otel_endpoint:
        root.info("otel export requested endpoint=%s (no SDK in image; "
                  "span events logged inline)", otel_endpoint)
    return root


def get_logger(name: str = "asr") -> logging.Logger:
    return logging.getLogger(name)


@contextlib.contextmanager
def request_span(kind: str, request_id: Optional[str] = None,
                 **fields: Any) -> Iterator[Dict[str, Any]]:
    """Attach request-scoped fields to all logs inside the span and emit
    start/end events with duration (span helpers,
    ref: tracing_config.rs:178-233)."""
    ctx = dict(_request_ctx.get())
    span = {"request_id": request_id or uuid.uuid4().hex[:16],
            "span": kind, **fields}
    token = _request_ctx.set({**ctx, **span})
    log = get_logger()
    t0 = time.perf_counter()
    log.debug("span start", extra={"fields": {"event": "start"}})
    try:
        yield span
        log.info("span end", extra={"fields": {
            "event": "end", "duration_ms":
                round((time.perf_counter() - t0) * 1e3, 2)}})
    except Exception as e:
        log.error("span error: %s", e, extra={"fields": {
            "event": "error", "duration_ms":
                round((time.perf_counter() - t0) * 1e3, 2)}})
        raise
    finally:
        _request_ctx.reset(token)

"""Reliability: circuit breaker, graceful shutdown, tracing.

(ref: src/reliability/ — the breaker is actually wired in here, unlike the
reference where it's commented out of the live client.)
"""

from .circuit_breaker import CircuitBreaker, CircuitState
from .graceful_shutdown import GracefulShutdown
from .tracing import (OtlpHttpExporter, get_exporter, get_logger,
                      init_tracing, request_span, set_exporter)

__all__ = ["CircuitBreaker", "CircuitState", "GracefulShutdown",
           "init_tracing", "get_logger", "request_span",
           "OtlpHttpExporter", "get_exporter", "set_exporter"]

"""HTTP/WebSocket serving layer with the reference's exact public surface
(ref: src/server/)."""

from .app import build_state, create_app, main, run_server
from .metrics import PrometheusMetrics, ServiceMetrics
from .state import AppState, TryAcquireSemaphore
from .stream import StreamProcessor

__all__ = [
    "create_app", "build_state", "run_server", "main",
    "AppState", "TryAcquireSemaphore", "ServiceMetrics",
    "PrometheusMetrics", "StreamProcessor",
]

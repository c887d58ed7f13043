from .metrics import RequestMetrics, get_request_metrics, record_request_duration
from .tracing import get_tracer, Span

__all__ = [
    "RequestMetrics",
    "get_request_metrics",
    "record_request_duration",
    "get_tracer",
    "Span",
]

from .retry import exponential_backoff
from .logging import get_logger

__all__ = ["exponential_backoff", "get_logger"]

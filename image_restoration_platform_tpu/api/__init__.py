from .app import create_app, main
from .context import AppContext

__all__ = ["create_app", "main", "AppContext"]

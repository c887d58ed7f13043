"""aiohttp application factory + server entry point.

Composition mirrors the reference's server.js: secrets gate -> middleware
chain -> health router -> authenticated /v1 router -> error handler.
"""

from __future__ import annotations

import asyncio

from aiohttp import web

from ..config import Config, assert_required_secrets, load_config
from ..utils.logging import get_logger
from .context import AppContext
from .middleware import (
    auth_middleware_factory,
    error_middleware,
    idempotency_middleware_factory,
    rate_limit_middleware_factory,
    request_context_middleware,
    security_headers_middleware,
    timing_middleware,
)
from .routes import setup_routes

_log = get_logger("server")


def _env_verifier():
    """Real JWT/JWKS verifier when AUTH_JWKS_* is configured; None keeps the
    dev mock token scheme (firebaseAuth.js fallback semantics)."""
    from .auth import create_verifier_from_env

    return create_verifier_from_env()


def create_app(ctx: AppContext | None = None, config: Config | None = None) -> web.Application:
    config = config or load_config()
    ctx = ctx or AppContext(config=config)

    app = web.Application(
        client_max_size=config.upload.max_file_size_bytes + 64 * 1024,
        middlewares=[
            request_context_middleware,
            timing_middleware,
            error_middleware,          # inside request-context so problems echo X-Request-Id
            security_headers_middleware,
            auth_middleware_factory(ctx, verifier=_env_verifier()),
            rate_limit_middleware_factory(ctx),
            idempotency_middleware_factory(ctx),
        ],
    )
    app["ctx"] = ctx
    setup_routes(app)

    async def on_shutdown(app: web.Application) -> None:
        # graceful queue drain on SIGTERM (SURVEY.md section 5)
        await asyncio.to_thread(ctx.shutdown)

    app.on_shutdown.append(on_shutdown)
    return app


def main() -> None:
    import os

    config = load_config()
    assert_required_secrets()
    ctx = AppContext(config=config)
    warmup = os.environ.get("SERVE_WARMUP", "")
    if warmup:
        # SERVE_WARMUP=256,512 picks the size buckets to warm before accepting
        # traffic; SERVE_WARMUP_FAMILIES widens coverage beyond the flagship:
        # a comma list of family names plus the pseudo-surface "fusion", or
        # "all" for every registered family + fusion — so the first SR, tiled
        # SR, fusion, or diffusion request never pays an in-request compile.
        # With the persistent executable cache this is fast after first boot.
        sizes = tuple(int(s) for s in warmup.split(",") if s)
        fam_env = os.environ.get("SERVE_WARMUP_FAMILIES", "")
        if fam_env.strip().lower() == "all":
            from ..models import list_families

            families = tuple(list_families()) + ("fusion",)
        elif fam_env:
            families = tuple(f.strip() for f in fam_env.split(",") if f.strip())
        else:
            families = ("restore-unet",)
        _log.info(
            "Warming serving executables", {"buckets": list(sizes), "families": list(families)}
        )
        report = ctx.engine.warmup_serving(families=families, sizes=sizes)
        _log.info("Warmup report", {k: round(v, 2) for k, v in report.items()})
    app = create_app(ctx=ctx, config=config)
    _log.info("Starting server", {"port": config.port})
    web.run_app(app, port=config.port, print=None)


if __name__ == "__main__":
    main()

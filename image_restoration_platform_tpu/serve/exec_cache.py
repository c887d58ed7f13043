"""Serialized-executable disk cache for the serving engine.

The TPU stack here compiles remotely and ignores the XLA persistent cache,
so every fresh process pays a multi-minute compile per program. We cache
*serialized executables* on disk instead (AOT-compile cache, SURVEY.md
section 5): keyed by the engine's structural cache signature plus a digest
of the compute-path SOURCE — serializing the lowered StableHLO for keying
is exact but takes minutes for 512px+ programs on this host; hashing the
source that *generates* the program is cheap and invalidates on any
model/op/classifier/program change.

The engine (serve/engine.py) keeps the in-memory executable dict and the
single-flight compile gate; this module owns only the disk tier.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import time

import jax

def enable_persistent_compilation_cache() -> None:
    """Persistent XLA executable cache across processes (AOT-compile cache per
    SURVEY.md section 5 checkpoint/resume): server restarts and bench runs
    reuse compiled programs instead of paying multi-minute TPU compiles."""
    # CPU-only contexts (tests, baseline runs) skip the cache: XLA:CPU AOT
    # results are machine-feature-pinned and reload with SIGILL-risk warnings.
    platforms = getattr(jax.config, "jax_platforms", None)
    if platforms and set(platforms.split(",")) == {"cpu"}:
        return

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/irp_xla_cache")
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


_code_fp_cache: str | None = None


def code_fingerprint() -> str:
    """Digest of every source file that shapes a device program."""
    global _code_fp_cache
    if _code_fp_cache is not None:
        return _code_fp_cache
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for sub in ("models", "classify", "ops", "serve/engine.py", "serve/programs"):
        path = os.path.join(root, sub)
        files = []
        if os.path.isfile(path):
            files = [path]
        else:
            for base, _, names in sorted(os.walk(path)):
                files += [os.path.join(base, n) for n in sorted(names) if n.endswith(".py")]
        for f in files:
            with open(f, "rb") as fh:
                h.update(fh.read())
    _code_fp_cache = h.hexdigest()
    return _code_fp_cache


def cache_dir() -> str:
    d = os.environ.get("IRP_EXEC_CACHE_DIR", "/root/.cache/irp_exec_cache")
    os.makedirs(d, exist_ok=True)
    return d


def cache_path(key_sig, dtype) -> str:
    digest = hashlib.sha256(
        (
            repr(key_sig)
            + code_fingerprint()
            + str(dtype)
            + jax.default_backend()
            + jax.__version__
        ).encode()
    ).hexdigest()
    return os.path.join(cache_dir(), f"{digest}.xc")


def load(path: str, logger, family_name: str):
    """Deserialize a cached executable, or None (stale/corrupt/missing)."""
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            blob, in_tree, out_tree = pickle.load(f)
        executable = se.deserialize_and_load(blob, in_tree, out_tree)
        logger.info(
            "Loaded cached executable",
            {"family": family_name, "digest": os.path.basename(path)[:12]},
        )
        return executable
    except Exception as error:  # stale/corrupt cache entry
        logger.warn("Executable cache load failed; recompiling", {"error": str(error)})
        return None


def compile_and_store(fn, params, example_args, path: str, logger, family_name: str):
    """Lower + compile ``fn`` and best-effort persist it at ``path``."""
    t0 = time.perf_counter()
    executable = fn.lower(params, *example_args).compile()
    logger.info(
        "Compiled program",
        {"family": family_name, "seconds": round(time.perf_counter() - t0, 1)},
    )
    try:
        from jax.experimental import serialize_executable as se

        blob, in_tree, out_tree = se.serialize(executable)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((blob, in_tree, out_tree), f)
        os.replace(tmp, path)
    except Exception as error:  # pragma: no cover - cache is best effort
        logger.warn("Executable cache save failed", {"error": str(error)})
    return executable

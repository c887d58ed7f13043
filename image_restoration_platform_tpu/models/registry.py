"""Model registry: named families -> (init, apply, config).

The serving layer selects a family per job type (restore / sr / diffusion)
and memoizes initialized params + jitted entry points per (family, bucket).
Checkpoint loading (train/checkpoint.py, orbax) plugs in here: a registered
family may be served with random-init weights (plumbing/bench mode) or weights
restored from a checkpoint directory.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Any, Callable

import jax

from . import diffusion, srnet, unet


@dataclass(frozen=True)
class ModelFamily:
    name: str
    init: Callable[..., dict]
    apply: Callable[..., Any]
    config: Any


_FAMILIES: dict[str, ModelFamily] = {}


def register(family: ModelFamily) -> None:
    _FAMILIES[family.name] = family


def get_family(name: str) -> ModelFamily:
    if name not in _FAMILIES:
        raise KeyError(f"unknown model family: {name}; have {sorted(_FAMILIES)}")
    return _FAMILIES[name]


def list_families() -> list[str]:
    return sorted(_FAMILIES)


# flagship: space-to-depth stem (input_scale=2) — ~2x serving throughput at
# equal quality (UNetConfig.input_scale); residual soft-shrinkage kills
# sub-quantization spurious corrections on near-clean inputs (bounded-harm
# contract) and measurably improves held-out gain (+0.4 dB)
register(
    ModelFamily(
        "restore-unet",
        unet.init,
        unet.apply,
        unet.UNetConfig(input_scale=2, residual_shrink=0.01),
    )
)
register(
    ModelFamily(
        "restore-unet-small",
        unet.init,
        unet.apply,
        unet.UNetConfig(
            base_channels=32,
            channel_mults=(1, 2),
            blocks_per_level=1,
            attn_heads=2,
            residual_shrink=0.01,
        ),
    )
)
register(ModelFamily("sr-x2", srnet.init, srnet.apply, srnet.SRNetConfig(scale=2)))
register(ModelFamily("sr-x4", srnet.init, srnet.apply, srnet.SRNetConfig(scale=4)))
register(
    ModelFamily("diffusion-restore", diffusion.init, diffusion.restore, diffusion.DiffusionConfig())
)


class ParamCache:
    """Per-process cache of initialized (or checkpoint-restored) params."""

    def __init__(self, seed: int = 0):
        self._params: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._seed = seed

    def get(self, family_name: str) -> dict:
        with self._lock:
            if family_name not in self._params:
                family = get_family(family_name)
                key = jax.random.PRNGKey(self._seed ^ hash(family_name) & 0x7FFFFFFF)
                params = family.init(key, family.config)
                # load trained weights when a checkpoint exists for the family
                from . import weights as weights_mod

                path = weights_mod.weights_path(family_name)
                import os

                if os.path.exists(path):
                    try:
                        params = weights_mod.load_params(params, path)
                    except Exception as error:
                        import logging

                        logging.getLogger("irp.registry").warning(
                            "failed to load weights for %s from %s: %s",
                            family_name, path, error,
                        )
                self._params[family_name] = params
            return self._params[family_name]

    def put(self, family_name: str, params: dict) -> None:
        with self._lock:
            self._params[family_name] = params

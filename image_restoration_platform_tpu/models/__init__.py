from . import nn, unet, srnet, diffusion
from .registry import ModelFamily, ParamCache, get_family, list_families, register

__all__ = [
    "nn",
    "unet",
    "srnet",
    "diffusion",
    "ModelFamily",
    "ParamCache",
    "get_family",
    "list_families",
    "register",
]

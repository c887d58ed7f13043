"""Per-family device program builders for the serving engine.

serve/engine.py owns the executable cache, dispatch, sharding, and device-
time accounting; everything that TRACES a program lives here (VERDICT r4
item 9 — the 1,064-line engine was a single mistake-prone surface).

Every builder returns a plain jittable ``fn(params, *args)``; the engine
lowers it through its AOT executable cache. Builders take explicit facts
(dtype, fold/s2d/stage flags) rather than the engine object so a program's
structure is fully determined by its arguments — the same facts the engine
folds into its cache keys (engine._exec_key).
"""

from .egress import to_yuv420, to_yuv420_s2d
from .fusion import build_fusion_program
from .restore import build_restore_program
from .sr import build_sr_spatial_program, build_sr_tiled_mesh_program, build_sr_tiled_program

__all__ = [
    "build_fusion_program",
    "build_restore_program",
    "build_sr_spatial_program",
    "build_sr_tiled_mesh_program",
    "build_sr_tiled_program",
    "to_yuv420",
    "to_yuv420_s2d",
]

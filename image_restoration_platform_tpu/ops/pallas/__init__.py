from .blend import blend_tiles_pallas

__all__ = ["blend_tiles_pallas"]

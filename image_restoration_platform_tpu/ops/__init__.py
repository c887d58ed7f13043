from .stencil import conv3x3_clamped_u8, gaussian_blur, K_LAPLACIAN8, K_HIGHPASS9, K_LAPLACIAN4
from .stats import channel_stats, flat_variance
from .resize import resize, resize_matrix
from .tile import tile_image, blend_tiles, tile_grid
from .deblur import deblur_canvas_batch, deblur_reference, select_hypothesis
from .deblock import deblock_canvas_batch, deblock_reference

__all__ = [
    "deblur_canvas_batch",
    "deblur_reference",
    "select_hypothesis",
    "deblock_canvas_batch",
    "deblock_reference",
    "conv3x3_clamped_u8",
    "gaussian_blur",
    "K_LAPLACIAN8",
    "K_HIGHPASS9",
    "K_LAPLACIAN4",
    "channel_stats",
    "flat_variance",
    "resize",
    "resize_matrix",
    "tile_image",
    "blend_tiles",
    "tile_grid",
]

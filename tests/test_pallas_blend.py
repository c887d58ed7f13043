"""Pallas overlap-blend kernel parity vs the XLA fold (interpret mode on CPU;
the same kernel is validated compiled on real TPU, see BASELINE.md)."""

import numpy as np
import jax.numpy as jnp
import pytest

from image_restoration_platform_tpu.ops.tile import blend_tiles, tile_image, tiled_apply
from image_restoration_platform_tpu.ops.pallas.blend import blend_tiles_pallas


@pytest.mark.parametrize(
    "hw,tile,overlap",
    [
        ((96, 80), 32, 8),
        ((64, 64), 32, 16),
        ((100, 68), 32, 8),   # clamped last tiles in both axes
        ((32, 32), 32, 8),    # single tile
    ],
)
def test_matches_xla_blend(hw, tile, overlap):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (*hw, 3)).astype(np.float32))
    tiles, ys, xs = tile_image(img, tile=tile, overlap=overlap)
    ref = np.asarray(blend_tiles(tiles, hw, ys, xs))
    out = np.asarray(blend_tiles_pallas(tiles, hw, ys, xs, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_identity_reconstruction():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, (96, 96, 3)).astype(np.float32))
    tiles, ys, xs = tile_image(img, tile=32, overlap=8)
    out = np.asarray(blend_tiles_pallas(tiles, (96, 96), ys, xs, interpret=True))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-3)


def test_tiled_apply_pallas_path(monkeypatch):
    monkeypatch.setenv("IRP_PALLAS_BLEND", "1")
    # force interpret mode through the env-independent arg by patching the
    # kernel entry (CPU backend can't compile Mosaic)
    import image_restoration_platform_tpu.ops.pallas.blend as blend_mod

    original = blend_mod.blend_tiles_pallas
    monkeypatch.setattr(
        blend_mod,
        "blend_tiles_pallas",
        lambda *a, **k: original(*a, **{**k, "interpret": True}),
    )
    img = jnp.asarray(np.random.default_rng(3).uniform(0, 255, (64, 64, 3)).astype(np.float32))
    out = np.asarray(tiled_apply(img, lambda t: t, tile=32, overlap=8))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-3)

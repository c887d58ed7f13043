"""Device op tests: resize operators, stencil clamping, tile/blend seams."""

import numpy as np
import jax.numpy as jnp
import pytest

from image_restoration_platform_tpu.ops import (
    resize,
    resize_matrix,
    tile_image,
    blend_tiles,
    conv3x3_clamped_u8,
    gaussian_blur,
    K_LAPLACIAN8,
)
from image_restoration_platform_tpu.ops.resize import fit_inside
from image_restoration_platform_tpu.ops.tile import tiled_apply, tile_grid


class TestResize:
    def test_matrix_rows_sum_to_one(self):
        for method in ("lanczos3", "bicubic", "bilinear", "box"):
            m = resize_matrix(128, 64, method)
            np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)

    def test_identity(self):
        img = np.random.default_rng(0).uniform(0, 255, (32, 48, 3)).astype(np.float32)
        out = np.asarray(resize(jnp.asarray(img), (32, 48)))
        np.testing.assert_allclose(out, img, atol=1e-3)

    def test_constant_preserved(self):
        img = np.full((64, 64, 3), 127.0, dtype=np.float32)
        out = np.asarray(resize(jnp.asarray(img), (29, 41)))
        np.testing.assert_allclose(out, 127.0, atol=1e-2)

    def test_downscale_antialias_matches_mean(self):
        # checkerboard downscaled 8x must approach the mean, not alias to a corner
        img = np.indices((128, 128)).sum(axis=0) % 2 * 255.0
        out = np.asarray(resize(jnp.asarray(img.astype(np.float32)), (16, 16)))
        assert abs(out.mean() - 127.5) < 4.0
        assert out.std() < 30.0

    def test_upscale_shapes(self):
        img = np.random.default_rng(1).uniform(0, 255, (16, 16, 3)).astype(np.float32)
        out = resize(jnp.asarray(img), (37, 53))
        assert out.shape == (37, 53, 3)

    def test_batched(self):
        img = np.random.default_rng(2).uniform(0, 255, (4, 16, 16, 3)).astype(np.float32)
        out = resize(jnp.asarray(img), (32, 32))
        assert out.shape == (4, 32, 32, 3)

    def test_fit_inside(self):
        assert fit_inside(4096, 2048, 2048) == (2048, 1024)
        assert fit_inside(1024, 768, 2048) == (1024, 768)  # withoutEnlargement
        assert fit_inside(3000, 1000, 2048) == (2048, 683)


class TestStencil:
    def test_clamping_matches_uint8(self):
        gray = jnp.asarray(np.random.default_rng(3).integers(0, 256, (32, 32)).astype(np.float32))
        out = np.asarray(conv3x3_clamped_u8(gray, K_LAPLACIAN8))
        assert out.min() >= 0.0 and out.max() <= 255.0
        assert np.all(out == np.round(out))

    def test_flat_image_zero_response(self):
        gray = jnp.full((16, 16), 180.0)
        out = np.asarray(conv3x3_clamped_u8(gray, K_LAPLACIAN8))
        np.testing.assert_allclose(out, 0.0)

    def test_gaussian_blur_preserves_mean(self):
        img = np.random.default_rng(4).uniform(0, 255, (64, 64, 3)).astype(np.float32)
        out = np.asarray(gaussian_blur(jnp.asarray(img), 2.0))
        assert abs(out.mean() - img.mean()) < 1.0
        assert out.std() < img.std()


class TestTiling:
    def test_tile_grid_covers(self):
        starts = tile_grid(100, 32, 24)
        assert starts[0] == 0 and starts[-1] == 100 - 32

    def test_identity_blend_is_seamless(self):
        """Tiling + blending with the identity function must reproduce the
        image exactly (partition-of-unity window normalisation)."""
        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.uniform(0, 255, (96, 80, 3)).astype(np.float32))
        out = np.asarray(tiled_apply(img, lambda t: t, tile=32, overlap=8))
        np.testing.assert_allclose(out, np.asarray(img), atol=1e-2)

    def test_linear_fn_matches_whole_image(self):
        """For a linear per-pixel model, tiled inference == whole-image inference."""
        img = jnp.asarray(np.random.default_rng(6).uniform(0, 255, (64, 64, 3)).astype(np.float32))
        fn = lambda t: t * 0.5 + 10.0
        tiled = np.asarray(tiled_apply(img, fn, tile=32, overlap=16))
        whole = np.asarray(fn(img))
        np.testing.assert_allclose(tiled, whole, atol=1e-2)

    def test_sr_scale_blend(self):
        img = jnp.asarray(np.random.default_rng(7).uniform(0, 255, (64, 64, 3)).astype(np.float32))

        def up2(tiles):
            return jnp.repeat(jnp.repeat(tiles, 2, axis=1), 2, axis=2)

        out = tiled_apply(img, up2, tile=32, overlap=8, scale=2)
        assert out.shape == (128, 128, 3)
        # nearest-neighbour upscale of a random image, blended: values stay in range
        assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 255.0

    def test_tile_batching_equivalent(self):
        img = jnp.asarray(np.random.default_rng(8).uniform(0, 255, (96, 96, 3)).astype(np.float32))
        fn = lambda t: t * 0.25
        a = np.asarray(tiled_apply(img, fn, tile=32, overlap=8))
        b = np.asarray(tiled_apply(img, fn, tile=32, overlap=8, tile_batch=3))
        np.testing.assert_allclose(a, b, atol=1e-4)

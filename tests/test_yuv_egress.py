"""Restore-path YCbCr 4:2:0 plane egress (config.restore_egress).

The fused restore program can emit (Y, Cb, Cr) u8 planes instead of the RGB
canvas — 1.5 B/px device->host instead of 3 B/px — and libjpeg consumes them
raw (imageio.encode_jpeg_ycbcr420). Same fast-egress design as the tiled-SR
path (serve/engine.py sr_tiled output="yuv420"); here it covers the standard
single-restore path, whose D2H is ~25% of single-request latency on the v5e
tunnel.
"""

import base64

import numpy as np
import jax.numpy as jnp
import pytest

from image_restoration_platform_tpu import imageio
from image_restoration_platform_tpu.config import ServingConfig
from image_restoration_platform_tpu.serve.engine import RestorationEngine
from image_restoration_platform_tpu.serve.restorator import RestoratorService


def _ref_planes(rgb_u8: np.ndarray):
    """Full-range BT.601 4:2:0 planes from an RGB u8 image (numpy oracle)."""
    f = rgb_u8.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    h, w = y.shape
    cbs = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    crs = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    u8 = lambda v: np.clip(np.round(v), 0, 255).astype(np.uint8)  # noqa: E731
    return u8(y), u8(cbs), u8(crs)


def test_engine_yuv_planes_match_rgb_output(tmp_path, monkeypatch):
    """f32 engine: the yuv420 program's planes match the BT.601 conversion of
    the SAME engine's RGB output to within 1 level (the planes quantize once
    from f32; the oracle quantizes RGB first, so each pixel can round once
    more)."""
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    valid = np.asarray([[32, 32], [31, 29]], np.int32)
    jpeg = np.asarray([0.0, 1.0], np.float32)

    eng = RestorationEngine(
        serving_config=ServingConfig(size_buckets=(32,), max_batch=2),
        compute_dtype=jnp.float32,
    )
    rgb, scores_rgb, _ = eng.restore_batch(imgs, valid, jpeg)
    (py, pcb, pcr), scores_yuv, _ = eng.restore_batch(imgs, valid, jpeg, egress="yuv420")
    np.testing.assert_array_equal(scores_rgb, scores_yuv)
    assert py.shape == (2, 32, 32) and pcb.shape == pcr.shape == (2, 16, 16)
    for i in range(2):
        ry, rcb, rcr = _ref_planes(rgb[i])
        assert np.abs(py[i].astype(int) - ry.astype(int)).max() <= 1
        assert np.abs(pcb[i].astype(int) - rcb.astype(int)).max() <= 1
        assert np.abs(pcr[i].astype(int) - rcr.astype(int)).max() <= 1


@pytest.mark.skipif(not imageio.native_available(), reason="needs native codec")
def test_restorator_yuv_egress_end_to_end(tmp_path, monkeypatch):
    """Restorator with restore_egress=yuv420: odd-size input (exercises the
    ceil-half chroma crop), output decodes to the right dims and is close to
    the RGB-egress output (difference = chroma subsampling only)."""
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    # smooth content: 4:2:0 chroma subsampling is near-lossless on smooth
    # images (on white noise it averages away the per-pixel chroma, which
    # would dominate the comparison without being a defect)
    yy, xx = np.mgrid[0:31, 0:29].astype(np.float64)
    img = np.stack(
        [40 + 5 * yy, 90 + 4 * xx, 160 - 3 * yy - 2 * xx], axis=-1
    ).clip(0, 255).astype(np.uint8)
    photo = imageio.encode_jpeg(img, quality=90)

    def run(egress):
        svc = RestoratorService(
            engine=RestorationEngine(
                serving_config=ServingConfig(
                    size_buckets=(32,), max_batch=2, restore_egress=egress
                )
            ),
            serving_config=ServingConfig(
                size_buckets=(32,), max_batch=2, restore_egress=egress
            ),
        )
        result = svc.restore(photo, options={"model": "restore-unet"})
        assert result["success"], result.get("error")
        return imageio.decode_image(
            base64.b64decode(result["restoredImage"])
        ).pixels

    out_yuv = run("yuv420")
    out_rgb = run("rgb")
    assert out_yuv.shape == out_rgb.shape == (31, 29, 3)
    # same restoration; only the chroma representation differs
    assert np.abs(out_yuv.astype(int) - out_rgb.astype(int)).mean() < 4.0


@pytest.mark.skipif(not imageio.native_available(), reason="needs native codec")
def test_restorator_yuv_falls_back_to_rgb_when_resizing(tmp_path, monkeypatch):
    """Inputs larger than the biggest bucket need a host resize after
    restore, which requires RGB — the egress choice must fall back."""
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)  # > bucket 32
    photo = imageio.encode_jpeg(img, quality=90)
    svc = RestoratorService(
        engine=RestorationEngine(
            serving_config=ServingConfig(
                size_buckets=(32,), max_batch=2, restore_egress="yuv420"
            )
        ),
        serving_config=ServingConfig(
            size_buckets=(32,), max_batch=2, restore_egress="yuv420"
        ),
    )
    result = svc.restore(photo, options={"model": "restore-unet"})
    assert result["success"], result.get("error")
    out = imageio.decode_image(base64.b64decode(result["restoredImage"])).pixels
    assert out.shape == (48, 40, 3)

"""Space-to-depth IO path (config.s2d_io): byte-identity with the standard
program.

The s2d_io serving program performs the global residual add in space-to-depth
layout and runs the single depth-to-space permutation on the final uint8
tensor, so no full-resolution bf16 [N,H,W,3] tensor exists in the program
(those use 3 of 128 TPU lanes; ~2 ms/step of layout copies at 512px b8 in the
2026-08-19 per-op profile). Because space_to_depth/pixel_shuffle are inverse
permutations and the head conv's output channel order matches
space_to_depth's (ph, pw, c) order, the computation is a reordering of
IDENTICAL elementwise ops — f32 engines must match bit-for-bit. Under bf16,
XLA's whole-program simplifier makes graph-shape-dependent choices (e.g.
folding the /255 ingress scale across the stem conv), so individual conv
outputs can re-round by 1 bf16 ulp — bound: <=1 byte level on a small pixel
fraction, like the fold tests (tests/test_folded.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from image_restoration_platform_tpu.config import ServingConfig
from image_restoration_platform_tpu.models import nn, unet
from image_restoration_platform_tpu.serve.engine import RestorationEngine


def test_space_to_depth_inverts_pixel_shuffle():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    for s in (2, 4):
        rt = nn.pixel_shuffle(nn.space_to_depth(x, s), s)
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))


def test_unet_apply_s2d_io_bitwise_identical():
    """unet.apply(s2d_io=True) on s2d input == pixel-unshuffled standard
    apply, bit-for-bit (f32): same values through the stem, residual channel
    order matches the input permutation."""
    import jax

    cfg = unet.UNetConfig(
        base_channels=16,
        channel_mults=(1, 2),
        blocks_per_level=1,
        attn_heads=2,
        norm_groups=8,
        input_scale=2,
        residual_shrink=0.01,
    )
    params = unet.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    cond = jnp.asarray(rng.random((2, cfg.cond_dim)), jnp.float32)

    out_std = unet.apply(params, x, cond, config=cfg)
    out_s2d = unet.apply(params, nn.space_to_depth(x, 2), cond, config=cfg, s2d_io=True)
    np.testing.assert_array_equal(
        np.asarray(out_std), np.asarray(nn.pixel_shuffle(out_s2d, 2))
    )


def test_unet_apply_s2d_io_rejects_unit_scale():
    import jax

    cfg = unet.UNetConfig(base_channels=16, channel_mults=(1,), blocks_per_level=1,
                          attn_heads=2, norm_groups=8)
    params = unet.init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    cond = jnp.zeros((1, cfg.cond_dim), jnp.float32)
    with pytest.raises(ValueError):
        unet.apply(params, x, cond, config=cfg, s2d_io=True)


def _engine(tmp_path, s2d_io: bool, **kw) -> RestorationEngine:
    return RestorationEngine(
        serving_config=ServingConfig(
            size_buckets=(32,), max_batch=2, s2d_io=s2d_io, **kw
        ),
    )


def test_engine_s2d_io_byte_identical_f32(tmp_path, monkeypatch):
    """Full serving program (stages on) in f32: s2d_io on/off byte-identical —
    the transform is a pure permutation of the computation."""
    import jax.numpy as jnp

    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    valid = np.asarray([[32, 32], [24, 28]], np.int32)
    jpeg = np.asarray([1.0, 0.0], np.float32)

    out_on, scores_on, _ = RestorationEngine(
        serving_config=ServingConfig(size_buckets=(32,), max_batch=2, s2d_io=True),
        compute_dtype=jnp.float32,
    ).restore_batch(imgs, valid, jpeg)
    out_off, scores_off, _ = RestorationEngine(
        serving_config=ServingConfig(size_buckets=(32,), max_batch=2, s2d_io=False),
        compute_dtype=jnp.float32,
    ).restore_batch(imgs, valid, jpeg)
    np.testing.assert_array_equal(out_on, out_off)
    np.testing.assert_array_equal(scores_on, scores_off)


def test_engine_s2d_io_bf16_within_one_level(tmp_path, monkeypatch):
    """Default (bf16) engines: XLA re-fuses the ingress scale differently per
    graph shape, so conv outputs can re-round by 1 bf16 ulp — <=1 byte level,
    small pixel fraction, identical scores."""
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    valid = np.asarray([[32, 32], [24, 28]], np.int32)
    jpeg = np.asarray([1.0, 0.0], np.float32)

    out_on, scores_on, _ = _engine(tmp_path, True).restore_batch(imgs, valid, jpeg)
    out_off, scores_off, _ = _engine(tmp_path, False).restore_batch(imgs, valid, jpeg)
    diff = np.abs(out_on.astype(np.int16) - out_off.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.10
    np.testing.assert_array_equal(scores_on, scores_off)


def test_engine_s2d_io_inactive_for_folded_and_unit_scale(tmp_path, monkeypatch):
    """The gate only fires for unfolded input_scale>1 UNet families."""
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    eng = _engine(tmp_path, True)
    assert eng._uses_s2d_io("restore-unet")
    assert not eng._uses_s2d_io("restore-unet-small")  # input_scale == 1
    assert not eng._uses_s2d_io("diffusion-restore")  # time-conditioned path
    folded_eng = _engine(tmp_path, True, fold_w=True)
    assert not folded_eng._uses_s2d_io("restore-unet")

"""W-folded serving transform (models/folded.py) must be numerically
equivalent to the standard forward — it is a weight reparameterization, not
an approximation. All checks run in f32 on CPU so tolerances are tight."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_platform_tpu.models import diffusion, folded, nn, unet


def _rand(key, shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


def test_fold_unfold_roundtrip():
    x = _rand(jax.random.PRNGKey(0), (2, 8, 16, 5))
    np.testing.assert_array_equal(np.asarray(folded.unfold_w(folded.fold_w(x))), np.asarray(x))
    # index semantics: folded channel 2c+p is column parity p of channel c
    f = folded.fold_w(x)
    np.testing.assert_array_equal(np.asarray(f[:, :, 3, 2 * 2 + 1]), np.asarray(x[:, :, 7, 2]))


@pytest.mark.parametrize("stride", [1, 2])
def test_folded_conv_matches(stride):
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = _rand(k1, (2, 16, 24, 6))
    p = nn.conv_init(k2, 6, 10)
    ref = nn.conv2d(p, x, stride=stride)
    pf = folded._fold_conv(p, stride=stride)
    got = folded.unfold_w(nn.conv2d(pf, folded.fold_w(x), stride=stride))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_folded_conv1x1_matches():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = _rand(k1, (2, 8, 12, 6))
    p = nn.conv_init(k2, 6, 4, kernel=1)
    ref = nn.conv2d(p, x)
    got = folded.unfold_w(nn.conv2d(folded._fold_conv(p), folded.fold_w(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_folded_group_norm_matches():
    x = _rand(jax.random.PRNGKey(3), (2, 8, 16, 64))
    p = {"scale": jnp.linspace(0.5, 1.5, 64), "bias": jnp.linspace(-0.2, 0.2, 64)}
    ref = nn.group_norm(p, x, groups=32)
    got = folded.unfold_w(nn.group_norm(folded._fold_gn(p), folded.fold_w(x), groups=32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_folded_upsample_matches():
    x = _rand(jax.random.PRNGKey(4), (2, 4, 8, 6))
    ref = nn.upsample_nearest(x, 2)
    got = folded.unfold_w(folded._upsample_nearest_folded(folded.fold_w(x)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("kernel", [3, 1])
def test_fold_upconv_matches(kernel):
    """The fold-preserving decoder upsample: four phase convs + sublane
    interleave must equal conv(nearest_up2(x)) exactly, including the SAME
    zero-pad boundaries on both axes (odd folded extents stress them)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    x = _rand(k1, (2, 5, 7, 10))  # folded input: W'=7, 2C=10
    p = nn.conv_init(k2, 5, 7, kernel=kernel)
    ref = nn.conv2d(p, nn.upsample_nearest(folded.unfold_w(x), 2))
    kern = folded._fold_upconv(p["w"])
    got = folded.unfold_w(folded.upconv2d_folded(kern, x)) + p["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_res_block_up_matches():
    """Fused up-res-block == res_block(up2(x), cat=skip): GN stats weighting
    (4x multiplicity for the low-res part) and both fused conv paths."""
    keys = jax.random.split(jax.random.PRNGKey(12), 6)
    in_ch, out_ch, emb_dim, groups = 8, 8, 16, 4
    bp = unet._res_block_init(keys[0], in_ch + out_ch, out_ch, emb_dim)
    x = _rand(keys[1], (2, 4, 6, in_ch))      # low res (folded W'=3)
    skip = _rand(keys[2], (2, 8, 12, out_ch))  # level res
    emb = _rand(keys[3], (2, emb_dim)) * 0.3
    ref = unet._res_block(bp, nn.upsample_nearest(x, 2), emb, groups, cat=skip)
    bpf = folded._fold_res_block(bp)
    ci_x = bp["conv1"]["w"].shape[2] - bp["conv1"]["w"].shape[3]
    up_p = {
        "conv1_up": folded._fold_upconv(bp["conv1"]["w"][:, :, :ci_x, :]),
        "skip_up": folded._fold_upconv(bp["skip"]["w"][:, :, :ci_x, :]),
    }
    got = folded.unfold_w(
        folded._res_block_up(bpf, up_p, folded.fold_w(x), folded.fold_w(skip), emb, groups)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize(
    "config,size",
    [
        (unet.UNetConfig(input_scale=2, residual_shrink=0.01), 64),  # flagship shape
        (
            unet.UNetConfig(
                base_channels=32, channel_mults=(1, 2), blocks_per_level=1, attn_heads=2
            ),
            32,
        ),
    ],
)
def test_apply_folded_matches_apply(config, size):
    kp, kx, kc = jax.random.split(jax.random.PRNGKey(5), 3)
    params = unet.init(kp, config)
    # non-trivial weights everywhere (head/film are zero-init)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(p.size % 97), p.shape, jnp.float32),
        params,
    )
    x = jax.random.uniform(kx, (2, size, size, 3), jnp.float32)
    cond = _rand(kc, (2, config.cond_dim)) * 0.3
    ref = unet.apply(params, x, cond, config=config)
    got = folded.apply(folded.fold_params(params, config), x, cond, config=config)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_diffusion_folded_matches():
    cfg = diffusion.DiffusionConfig(sample_steps=2)
    kp, kx, kc = jax.random.split(jax.random.PRNGKey(6), 3)
    params = diffusion.init(kp, cfg)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(p.size % 89), p.shape, jnp.float32),
        params,
    )
    x = jax.random.uniform(kx, (1, 32, 32, 3), jnp.float32)
    cond = _rand(kc, (1, cfg.unet.cond_dim)) * 0.3
    key = jax.random.PRNGKey(7)
    ref = diffusion.restore(params, x, cond, key, cfg)
    got = diffusion.restore(
        folded.fold_params(params, cfg.unet), x, cond, key, cfg, apply_fn=folded.apply
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_srnet_folded_matches():
    from image_restoration_platform_tpu.models import srnet

    cfg = srnet.SRNetConfig(scale=2, num_blocks=3)
    kp, kx = jax.random.split(jax.random.PRNGKey(8))
    params = srnet.init(kp, cfg)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(p.size % 83), p.shape, jnp.float32),
        params,
    )
    x = jax.random.uniform(kx, (2, 24, 32, 3), jnp.float32)
    ref = srnet.apply(params, x, cfg)
    got = folded.apply_srnet(folded.fold_params_srnet(params), x, cfg)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_engine_sr_folded_matches_unfolded_f32(tmp_path, monkeypatch):
    """The fold transform itself is exact: f32 engines must agree to within
    one uint8 quantization step (round-to-nearest ties at the .5 boundary)."""
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    from image_restoration_platform_tpu.config import ServingConfig
    from image_restoration_platform_tpu.serve.engine import RestorationEngine

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    out_on, _ = RestorationEngine(
        serving_config=ServingConfig(size_buckets=(32,), max_batch=2, fold_w_sr=True),
        compute_dtype=jnp.float32,
    ).sr_batch(imgs, "sr-x2")
    out_off, _ = RestorationEngine(
        serving_config=ServingConfig(size_buckets=(32,), max_batch=2, fold_w_sr=False),
        compute_dtype=jnp.float32,
    ).sr_batch(imgs, "sr-x2")
    diff = np.abs(out_on.astype(np.int16) - out_off.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.25


def test_engine_sr_folded_matches_unfolded_bf16(tmp_path, monkeypatch):
    """Default (bf16) engines: the folded conv sums the same products in a
    different association order, so each conv output can differ by 1 bf16 ulp
    (2^-8 relative ~ 1 byte level at full scale); the SRNet residual chain can
    compound two such flips before the final quantize. Bound: <=2 byte levels,
    mostly-zero diff. The exactness of the transform is asserted by the f32
    test above and test_srnet_folded_matches."""
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    from image_restoration_platform_tpu.config import ServingConfig
    from image_restoration_platform_tpu.serve.engine import RestorationEngine

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    out_on, _ = RestorationEngine(
        serving_config=ServingConfig(size_buckets=(32,), max_batch=2, fold_w_sr=True)
    ).sr_batch(imgs, "sr-x2")
    out_off, _ = RestorationEngine(
        serving_config=ServingConfig(size_buckets=(32,), max_batch=2, fold_w_sr=False)
    ).sr_batch(imgs, "sr-x2")
    diff = np.abs(out_on.astype(np.int16) - out_off.astype(np.int16))
    assert diff.max() <= 2
    assert (diff > 1).mean() < 0.01
    assert (diff > 0).mean() < 0.25


def test_engine_fusion_folded_matches_unfolded(tmp_path, monkeypatch):
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    from image_restoration_platform_tpu.config import ServingConfig
    from image_restoration_platform_tpu.serve.engine import RestorationEngine

    rng = np.random.default_rng(2)
    canvas = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    valid = np.asarray([[32, 32], [32, 32]], np.int32)
    jf = np.asarray([1.0, 1.0], np.float32)

    def run(fold):
        eng = RestorationEngine(
            serving_config=ServingConfig(size_buckets=(32,), max_batch=2, fold_w=fold)
        )
        fused, scores, _ = eng.fuse_batch(canvas, valid, jf, "restore-unet-small")
        return fused, scores

    f_on, s_on = run(True)
    f_off, s_off = run(False)
    np.testing.assert_allclose(s_on, s_off, rtol=1e-4, atol=1e-4)
    # the composite blends K restored images, so per-image bf16 rounding
    # flips can compound to 2 quantization steps
    diff = np.abs(f_on.astype(np.int16) - f_off.astype(np.int16))
    assert diff.max() <= 2


def test_engine_serves_folded_matching_unfolded(tmp_path, monkeypatch):
    """End-to-end: the engine with fold_w on must produce byte-identical (or
    off-by-one-quantization) outputs vs fold_w off, through the full fused
    program."""
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    from image_restoration_platform_tpu.config import ServingConfig
    from image_restoration_platform_tpu.serve.engine import RestorationEngine

    rng = np.random.default_rng(0)
    canvas = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    valid = np.asarray([[64, 64], [48, 56]], np.int32)
    jf = np.asarray([1.0, 0.0], np.float32)

    import jax.numpy as jnp2

    cfg_on = ServingConfig(size_buckets=(64,), max_batch=2, fold_w=True)
    cfg_off = ServingConfig(size_buckets=(64,), max_batch=2, fold_w=False)
    # f32 engines: tests the fold transform itself rather than bf16
    # reassociation noise (which grows with residual magnitude as weights
    # get stronger)
    out_on, scores_on, _ = RestorationEngine(
        serving_config=cfg_on, compute_dtype=jnp2.float32
    ).restore_batch(canvas, valid, jf, "restore-unet")
    out_off, scores_off, _ = RestorationEngine(
        serving_config=cfg_off, compute_dtype=jnp2.float32
    ).restore_batch(canvas, valid, jf, "restore-unet")
    np.testing.assert_allclose(scores_on, scores_off, rtol=1e-4, atol=1e-4)
    diff = np.abs(out_on.astype(np.int16) - out_off.astype(np.int16))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.02

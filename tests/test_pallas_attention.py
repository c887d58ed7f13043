"""Pallas bottleneck attention: forward exactness vs naive XLA attention and
backward (custom_vjp) gradient correctness."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_platform_tpu.ops.pallas.attention import flash_attention


def naive(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "nhqk,nhkd->nhqd", probs, v.astype(jnp.float32), preferred_element_type=jnp.float32
    ).astype(q.dtype)


@pytest.mark.parametrize("shape", [(2, 4, 256, 64), (1, 2, 512, 64), (2, 4, 16, 8)])
def test_forward_matches_naive(shape):
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16) for _ in range(3)
    )
    got = flash_attention(q, k, v).astype(jnp.float32)
    ref = naive(q, k, v).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(got - ref))) < 0.02


def test_gradients_match_naive():
    rng = np.random.default_rng(1)
    shape = (1, 2, 64, 16)
    q, k, v = (jnp.asarray(rng.normal(0, 1, shape), jnp.float32) for _ in range(3))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v).astype(jnp.float32)))

    def loss_naive(q, k, v):
        return jnp.sum(jnp.square(naive(q, k, v).astype(jnp.float32)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("bq", [64, 128, 256])
@pytest.mark.parametrize("late_div", [False, True])
def test_variant_matrix_matches_naive(bq, late_div):
    """Every (query block, divide placement) combination the on-chip autotune
    (scripts/measure_attention.py) sweeps must stay exact vs naive XLA."""
    from image_restoration_platform_tpu.ops.pallas.attention import _attention_nh

    rng = np.random.default_rng(2)
    shape = (4, 512, 64)  # [N*H, T, D]
    q, k, v = (jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16) for _ in range(3))
    got = _attention_nh(
        q, k, v, interpret=jax.default_backend() == "cpu", bq=bq, late_div=late_div
    ).astype(jnp.float32)
    ref = naive(q[:, None], k[:, None], v[:, None])[:, 0].astype(jnp.float32)
    assert float(jnp.max(jnp.abs(got - ref))) < 0.02


def test_odd_token_count_rejected():
    q = jnp.zeros((1, 1, 300, 8), jnp.float32)
    with pytest.raises(ValueError):
        flash_attention(q, q, q)

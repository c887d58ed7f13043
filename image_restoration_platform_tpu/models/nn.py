"""Minimal functional NN layer library (pure JAX, explicit param pytrees).

The restoration backbones are built from these primitives rather than a
framework like flax so that (a) the parameter tree layout is stable and
explicit — sharding rules in parallel/sharding.py pattern-match on path names —
and (b) everything stays a plain pytree-in/pytree-out function that composes
with jit/pjit/shard_map/scan without adapter layers.

Conventions:
  - activations are NHWC (TPU-native layout; channels on the 128-lane axis)
  - params are dicts of jnp arrays; initializers take an explicit PRNG key
  - compute dtype is a caller choice (bf16 on TPU); params stay f32 and are
    cast at the call site, so optimizers and checkpoints see full precision
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def _split(key, n):
    return jax.random.split(key, n)


# ----------------------------------------------------------------- dense

def dense_init(key, in_dim: int, out_dim: int, scale: float = 1.0) -> Params:
    std = scale * math.sqrt(2.0 / in_dim)
    w = jax.random.normal(key, (in_dim, out_dim), dtype=jnp.float32) * std
    return {"w": w, "b": jnp.zeros((out_dim,), dtype=jnp.float32)}


def dense(params: Params, x: jax.Array) -> jax.Array:
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype) + b


# ------------------------------------------------------------------ conv

def conv_init(key, in_ch: int, out_ch: int, kernel: int = 3, scale: float = 1.0) -> Params:
    fan_in = in_ch * kernel * kernel
    std = scale * math.sqrt(2.0 / fan_in)
    w = jax.random.normal(key, (kernel, kernel, in_ch, out_ch), dtype=jnp.float32) * std
    return {"w": w, "b": jnp.zeros((out_ch,), dtype=jnp.float32)}


def conv2d(params: Params, x: jax.Array, stride: int = 1, padding: str = "SAME") -> jax.Array:
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return out + b


# ------------------------------------------------------------ group norm

def group_norm_init(ch: int) -> Params:
    return {"scale": jnp.ones((ch,), jnp.float32), "bias": jnp.zeros((ch,), jnp.float32)}


def _gn_groups(c: int, groups: int) -> int:
    g = min(groups, c)
    while c % g != 0:  # static python loop at trace time
        g -= 1
    return g


def group_norm_stats(x: jax.Array, groups: int, eps: float = 1e-5) -> tuple[jax.Array, jax.Array]:
    """Per-channel-first GN statistics -> (mean_c, inv_c), both [N, C] f32.

    TPU-critical formulation: reducing the natural [N,H,W,G,C/G] layout over
    (H,W,C/G) puts a tiny C/G group (often 2) on the 128-lane axis and wastes
    ~64x reduce bandwidth — profiled at a third of the whole serving step.
    Instead reduce over (H,W) with the FULL channel dim on lanes, then combine
    the per-channel moments into group moments with a [N,C]-sized reshape
    (identical math, f32 association order aside).
    """
    n, h, w, c = x.shape
    g = _gn_groups(c, groups)
    per = c // g
    cnt = h * w * per

    # one-pass moments: both reductions fuse into the producing conv's
    # epilogue, so GN statistics cost zero extra HBM reads. E[x^2]-mu^2 in f32
    # is safe here: post-conv activations are O(1)-scaled and near zero-mean,
    # and var is clamped non-negative before rsqrt.
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))  # [N, C] — lane-aligned reduction
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2))  # [N, C]
    mean_g = jnp.sum(s1.reshape(n, g, per), axis=-1) / cnt  # [N, G]
    ex2_g = jnp.sum(s2.reshape(n, g, per), axis=-1) / cnt
    var_g = jnp.maximum(ex2_g - jnp.square(mean_g), 0.0)
    mean_c = jnp.repeat(mean_g, per, axis=-1)  # [N, C]
    inv_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), per, axis=-1)  # [N, C]
    return mean_c, inv_c


def group_norm(params: Params, x: jax.Array, groups: int = 32, eps: float = 1e-5) -> jax.Array:
    mean_c, inv_c = group_norm_stats(x, groups, eps)
    # fold (x - mean) * inv * scale + bias into one affine so the apply pass
    # fuses into the consumer (SiLU -> conv prologue)
    scale = params["scale"][None, :] * inv_c  # [N, C] f32
    bias = params["bias"][None, :] - mean_c * scale
    out = x.astype(jnp.float32) * scale[:, None, None, :] + bias[:, None, None, :]
    return out.astype(x.dtype)


def _apply_affine(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    return (
        x.astype(jnp.float32) * scale[:, None, None, :] + bias[:, None, None, :]
    ).astype(x.dtype)


def group_norm_cat(
    params: Params, parts: list[jax.Array], groups: int = 32, eps: float = 1e-5
) -> list[jax.Array]:
    """GroupNorm over the *virtual concatenation* of ``parts`` along channels,
    returned still split — the decoder skip-concat without ever materializing
    the concat (profiled layout copies were ~14% of the serving step).

    Identical math to ``group_norm(concat(parts))``: per-channel moments are
    computed per part (lane-aligned reduces), joined as cheap [N, C] vectors,
    and combined into group moments spanning the virtual channel axis.
    """
    n = parts[0].shape[0]
    c = sum(p.shape[-1] for p in parts)
    g = _gn_groups(c, groups)
    per = c // g
    h, w = parts[0].shape[1], parts[0].shape[2]
    cnt = h * w * per

    s1 = jnp.concatenate(
        [jnp.sum(p.astype(jnp.float32), axis=(1, 2)) for p in parts], axis=-1
    )  # [N, C]
    s2 = jnp.concatenate(
        [jnp.sum(jnp.square(p.astype(jnp.float32)), axis=(1, 2)) for p in parts], axis=-1
    )
    mean_g = jnp.sum(s1.reshape(n, g, per), axis=-1) / cnt
    ex2_g = jnp.sum(s2.reshape(n, g, per), axis=-1) / cnt
    var_g = jnp.maximum(ex2_g - jnp.square(mean_g), 0.0)
    mean_c = jnp.repeat(mean_g, per, axis=-1)
    inv_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), per, axis=-1)

    scale = params["scale"][None, :] * inv_c
    bias = params["bias"][None, :] - mean_c * scale
    out = []
    offset = 0
    for p in parts:
        pc = p.shape[-1]
        out.append(_apply_affine(p, scale[:, offset : offset + pc], bias[:, offset : offset + pc]))
        offset += pc
    return out


def conv2d_cat(params: Params, parts: list[jax.Array], stride: int = 1) -> jax.Array:
    """conv2d over a virtual channel-concat: conv(concat(a, b), W) ==
    conv(a, W[..., :ca, :]) + conv(b, W[..., ca:, :]) — weight slicing is free
    at trace time and the concat copy never hits HBM."""
    w = params["w"]
    b = params["b"].astype(parts[0].dtype)
    out = None
    offset = 0
    for p in parts:
        pc = p.shape[-1]
        piece = jax.lax.conv_general_dilated(
            p,
            w[:, :, offset : offset + pc, :].astype(p.dtype),
            window_strides=(stride, stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=p.dtype,
        )
        out = piece if out is None else out + piece
        offset += pc
    return out + b


# ----------------------------------------------------------------- film

def film_init(key, cond_dim: int, ch: int) -> Params:
    # zero-init so conditioning starts as identity modulation
    return {
        "w": jnp.zeros((cond_dim, 2 * ch), dtype=jnp.float32),
        "b": jnp.zeros((2 * ch,), dtype=jnp.float32),
    }


def film(params: Params, x: jax.Array, cond: jax.Array) -> jax.Array:
    """Feature-wise linear modulation: x * (1+gamma) + beta from cond [N,D]."""
    gb = dense(params, cond.astype(x.dtype))
    gamma, beta = jnp.split(gb, 2, axis=-1)
    return x * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]


# ------------------------------------------------------------- attention

def attention_init(key, ch: int) -> Params:
    k1, k2 = _split(key, 2)
    return {
        "norm": group_norm_init(ch),
        "qkv": dense_init(k1, ch, 3 * ch),
        "proj": dense_init(k2, ch, ch, scale=0.1),
    }


def attention(params: Params, x: jax.Array, heads: int) -> jax.Array:
    """Spatial self-attention over the HxW grid (used at the bottleneck).

    Heads live on a dedicated axis so tensor-parallel sharding can split them
    (parallel/sharding.py). Softmax accumulates in f32.
    """
    n, h, w, c = x.shape
    hd = c // heads
    y = group_norm(params["norm"], x)
    qkv = dense(params["qkv"], y.reshape(n, h * w, c))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, h * w, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(n, h * w, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(n, h * w, heads, hd).transpose(0, 2, 1, 3)
    t = h * w
    if t % min(256, t) == 0 and hd % 8 == 0:
        # Pallas kernel: logits stay in VMEM instead of costing ~2 GB of HBM
        # traffic each way at the 512px bucket (ops/pallas/attention.py)
        from ..ops.pallas.attention import flash_attention

        out = flash_attention(q, k, v)
    else:
        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum("nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("nhqk,nhkd->nhqd", probs, v, preferred_element_type=x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(n, h * w, c)
    out = dense(params["proj"], out).reshape(n, h, w, c)
    return x + out


# --------------------------------------------------------- up/downsample

def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """Depth-to-space: [N,H,W,C*r^2] -> [N,H*r,W*r,C] (SR upsampler head)."""
    n, h, w, c = x.shape
    r = factor
    out_c = c // (r * r)
    x = x.reshape(n, h, w, r, r, out_c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, out_c)


def space_to_depth(x: jax.Array, factor: int) -> jax.Array:
    """Inverse of pixel_shuffle: [N,H,W,C] -> [N,H/r,W/r,C*r^2].

    Channel order is (ph, pw, c) ph-major — the same order pixel_shuffle
    consumes, so ``pixel_shuffle(space_to_depth(x, r), r) == x`` and a
    residual computed pre-shuffle aligns channel-for-channel with the
    space-to-depth of the full-res input (serve/engine.py s2d_io path)."""
    n, h, w, c = x.shape
    s = factor
    x = x.reshape(n, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // s, w // s, s * s * c)


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


# --------------------------------------------------------- time embedding

def sinusoidal_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Standard transformer sinusoidal embedding of scalar timesteps [N]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def param_count(params) -> int:
    leaves = jax.tree_util.tree_leaves(params)
    return sum(int(p.size) for p in leaves if hasattr(p, "size"))


def cast_params(params, dtype):
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if hasattr(p, "astype") and jnp.issubdtype(p.dtype, jnp.floating) else p,
        params,
    )

"""RestorationUNet — the flagship conditioned restoration backbone.

Replaces the reference's external Gemini image-model call
(/root/reference/server-node/src/clients/geminiClient.js:32-97) with an on-TPU
model. The prompt enhancer's template selection becomes a 28-dim conditioning
vector (prompt/enhancer.py) injected through FiLM modulation after every
GroupNorm — the numeric analog of "reduce severe motion blur, ...".

Architecture (TPU-first choices):
  - NHWC everywhere; channel counts are multiples of 64 so convs tile cleanly
    onto the 128x128 MXU in bf16
  - encoder/decoder with stride-2 conv downsampling and nearest+conv
    upsampling, residual blocks with GroupNorm -> SiLU -> conv and FiLM
  - spatial self-attention at the bottleneck only (H/8 x W/8 tokens)
  - global residual: the network predicts a correction added to its input,
    so identity restoration is the zero-init fixed point
  - optional sinusoidal timestep embedding (shared cond MLP) so the same
    backbone serves as the epsilon-model for the diffusion sampler

The forward is shape-polymorphic across the serving buckets (256/512/1024);
each bucket compiles once and is cached (serve/batcher.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import nn


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 3
    out_channels: int = 3
    base_channels: int = 64
    channel_mults: tuple[int, ...] = (1, 2, 4)
    blocks_per_level: int = 2
    cond_dim: int = 28           # prompt.COND_DIM
    emb_dim: int = 256
    attn_heads: int = 4
    norm_groups: int = 32
    time_conditioned: bool = False  # True for the diffusion variant
    # skip bottleneck self-attention above this token count: naive attention
    # materialises [N, heads, T, T] logits, which at a 1024px bucket
    # (T = 128*128 = 16k tokens) is ~4 GB — past HBM budget. 4096 tokens
    # (<=64x64 bottleneck, i.e. <=512px inputs at /8) stays ~256 MB.
    max_attn_tokens: int = 4096
    # space-to-depth stem factor: the network runs at (H/s, W/s) with s^2 x
    # channels and pixel-shuffles back at the head. s=2 quarters the spatial
    # work of the full-res level — small-channel convs at 512px are heavily
    # lane-underutilised on the MXU, so trading resolution for channels is
    # nearly free in quality and ~2x in wall time.
    input_scale: int = 1
    # soft-threshold shrinkage on the global residual (sign(r)*max(|r|-s, 0)):
    # a sparsity prior on corrections. Sub-quantization spurious residuals on
    # near-clean inputs vanish (the clean-input no-harm contract) while real
    # restoration residuals (10-50x larger) lose only the constant s.
    residual_shrink: float = 0.0


def _res_block_init(key, in_ch, out_ch, emb_dim):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "norm1": nn.group_norm_init(in_ch),
        "conv1": nn.conv_init(k1, in_ch, out_ch),
        "film": nn.film_init(k2, emb_dim, out_ch),
        "norm2": nn.group_norm_init(out_ch),
        "conv2": nn.conv_init(k3, out_ch, out_ch, scale=0.1),
    }
    if in_ch != out_ch:
        p["skip"] = nn.conv_init(k4, in_ch, out_ch, kernel=1)
    return p


def _res_block(p, x, emb, groups, cat=None):
    """Residual block; ``cat`` is an optional second input *logically*
    concatenated to x on channels (the decoder skip). It is consumed via
    virtual-concat GN + split-weight convs (nn.group_norm_cat/conv2d_cat), so
    the concat copy never materializes in HBM — identical math, measured ~14%
    of the serving step was layout copies."""
    if cat is None:
        h = nn.group_norm(p["norm1"], x, groups)
        h = nn.silu(h)
        h = nn.conv2d(p["conv1"], h)
    else:
        na, nb = nn.group_norm_cat(p["norm1"], [x, cat], groups)
        h = nn.conv2d_cat(p["conv1"], [nn.silu(na), nn.silu(nb)])
    h = nn.film(p["film"], h, emb)
    h = nn.group_norm(p["norm2"], h, groups)
    h = nn.silu(h)
    h = nn.conv2d(p["conv2"], h)
    if cat is None:
        skip = nn.conv2d(p["skip"], x) if "skip" in p else x
    else:
        skip = nn.conv2d_cat(p["skip"], [x, cat]) if "skip" in p else x
    return skip + h


def init(key: jax.Array, config: UNetConfig = UNetConfig()) -> dict:
    c = config
    keys = iter(jax.random.split(key, 256))
    ch = [c.base_channels * m for m in c.channel_mults]

    cond_in = c.cond_dim + (c.emb_dim if c.time_conditioned else 0)
    s2 = c.input_scale * c.input_scale
    params: dict = {
        "cond_mlp1": nn.dense_init(next(keys), cond_in, c.emb_dim),
        "cond_mlp2": nn.dense_init(next(keys), c.emb_dim, c.emb_dim),
        "stem": nn.conv_init(next(keys), c.in_channels * s2, ch[0]),
    }

    # encoder
    enc = []
    in_ch = ch[0]
    for level, out_ch in enumerate(ch):
        level_p = {"blocks": []}
        for _ in range(c.blocks_per_level):
            level_p["blocks"].append(_res_block_init(next(keys), in_ch, out_ch, c.emb_dim))
            in_ch = out_ch
        if level < len(ch) - 1:
            level_p["down"] = nn.conv_init(next(keys), out_ch, out_ch)
        enc.append(level_p)
    params["enc"] = enc

    # bottleneck with attention
    params["mid"] = {
        "block1": _res_block_init(next(keys), in_ch, in_ch, c.emb_dim),
        "attn": nn.attention_init(next(keys), in_ch),
        "block2": _res_block_init(next(keys), in_ch, in_ch, c.emb_dim),
    }

    # decoder (mirror): the first block of each level consumes the encoder
    # skip concat, subsequent blocks run at the level width
    dec = []
    for level in reversed(range(len(ch))):
        out_ch = ch[level]
        level_p = {"blocks": []}
        for j in range(c.blocks_per_level):
            block_in = in_ch + out_ch if j == 0 else out_ch
            level_p["blocks"].append(_res_block_init(next(keys), block_in, out_ch, c.emb_dim))
        in_ch = out_ch
        if level > 0:
            level_p["up"] = nn.conv_init(next(keys), out_ch, out_ch)
        dec.append(level_p)
    params["dec"] = dec

    params["head_norm"] = nn.group_norm_init(ch[0])
    # zero-init head: the model starts as the identity restoration
    params["head"] = {
        "w": jnp.zeros((3, 3, ch[0], c.out_channels * s2), jnp.float32),
        "b": jnp.zeros((c.out_channels * s2,), jnp.float32),
    }
    return params


_space_to_depth = nn.space_to_depth


def apply(
    params: dict,
    x: jax.Array,
    cond: jax.Array,
    t: jax.Array | None = None,
    config: UNetConfig = UNetConfig(),
    s2d_io: bool = False,
) -> jax.Array:
    """Forward pass: x [N,H,W,3] in [0,1], cond [N,cond_dim] -> restored [N,H,W,3].

    H and W must be divisible by 2**(len(channel_mults)-1); the serving layer
    guarantees this via size bucketing (config.serving.size_buckets).

    ``s2d_io=True`` (requires input_scale > 1 and in_channels == out_channels):
    x is already in space-to-depth layout [N, H/s, W/s, 3*s^2] and the return
    stays in that layout — the caller applies the single u8 depth-to-space
    permutation after quantization. Value-exact vs the standard path
    (space_to_depth is a permutation and the stem consumes the same numbers;
    the global residual's (ph, pw, c) channel order matches the head conv's
    pixel-shuffle order, see nn.space_to_depth). This keeps every
    full-resolution tensor in the serving program uint8: the bf16 [N,H,W,3]
    ingress/egress tensors use 3 of 128 TPU lanes and cost ~2 ms/step in
    layout copies + conversions at 512px b8 (parse_xplane 2026-08-19).
    """
    c = config
    dtype = x.dtype

    emb_in = cond.astype(dtype)
    if c.time_conditioned:
        if t is None:
            t = jnp.zeros((x.shape[0],), dtype=jnp.float32)
        emb_in = jnp.concatenate(
            [emb_in, nn.sinusoidal_embedding(t, c.emb_dim).astype(dtype)], axis=-1
        )
    emb = nn.dense(params["cond_mlp1"], emb_in)
    emb = nn.silu(emb)
    emb = nn.dense(params["cond_mlp2"], emb)

    if s2d_io:
        if c.input_scale <= 1 or c.in_channels != c.out_channels:
            raise ValueError("s2d_io requires input_scale > 1 and in == out channels")
        x_in = x  # already [N, H/s, W/s, in_channels * s^2]
    else:
        x_in = _space_to_depth(x, c.input_scale) if c.input_scale > 1 else x
    h = nn.conv2d(params["stem"], x_in)

    skips = []
    for level, level_p in enumerate(params["enc"]):
        for bp in level_p["blocks"]:
            h = _res_block(bp, h, emb, c.norm_groups)
        skips.append(h)
        if "down" in level_p:
            h = nn.conv2d(level_p["down"], h, stride=2)

    mid = params["mid"]
    h = _res_block(mid["block1"], h, emb, c.norm_groups)
    if h.shape[1] * h.shape[2] <= c.max_attn_tokens:  # static at trace time
        h = nn.attention(mid["attn"], h, c.attn_heads)
    h = _res_block(mid["block2"], h, emb, c.norm_groups)

    for i, level_p in enumerate(params["dec"]):
        skip = skips[len(skips) - 1 - i]
        if h.shape[1] != skip.shape[1]:
            h = nn.upsample_nearest(h, skip.shape[1] // h.shape[1])
        for j, bp in enumerate(level_p["blocks"]):
            # first block of each level consumes the encoder skip as a
            # virtual concat (no HBM copy); later blocks run at level width
            h = _res_block(bp, h, emb, c.norm_groups, cat=skip if j == 0 else None)
        if "up" in level_p:
            h = nn.conv2d(level_p["up"], h)

    h = nn.group_norm(params["head_norm"], h, c.norm_groups)
    h = nn.silu(h)
    residual = nn.conv2d(params["head"], h)
    if c.input_scale > 1 and not s2d_io:
        residual = nn.pixel_shuffle(residual, c.input_scale)
    # global residual over the first out_channels of the input — when the
    # input carries extra conditioning channels (image-conditioned diffusion,
    # in_channels > out_channels), the skip applies to the target slice only.
    # In s2d_io mode the head conv's output channel order (ph, pw, c) matches
    # space_to_depth's, so base = x adds the identical pixel pairs.
    if s2d_io:
        base = x
    else:
        base = x if x.shape[-1] == c.out_channels else x[..., : c.out_channels]
    if c.residual_shrink > 0.0:
        r = residual.astype(jnp.float32)
        residual = jnp.sign(r) * jnp.maximum(jnp.abs(r) - c.residual_shrink, 0.0)
    return base + residual.astype(dtype)

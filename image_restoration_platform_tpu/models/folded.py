"""W-fold serving transform: run the UNet with width-pairs folded into lanes.

The flagship's full-res level is 64-channel: its 3x3 convs fill only half of
the MXU's 128-lane output dimension and measure ~17% MFU on v5e (honest
chain-differenced microbench; `block_until_ready` alone does not serialize on
this stack). Folding adjacent width columns into channels — X'[n,h,w',2c+p] =
X[n,h,2w'+p,c] — doubles every level's channel count and re-expresses every
3x3 conv EXACTLY as a 3x3 conv on the folded layout with a half-zero
[kh,3,2ci,2co] weight: 2x the nominal FLOPs at 4x the utilization. Measured
per-conv on v5e (b8, chain-differenced):

    [8,256,256, 64] 1.143 ms  17% MFU  ->  [8,256,128,128] 0.580 ms  68% MFU
    [8, 64, 64,256] 0.757 ms  26% MFU  ->  [8, 64, 32,512] 0.447 ms  88% MFU

This is a weight reparameterization, not an approximation: fold_params maps a
trained checkpoint to the folded weights once at load, and apply() below is
numerically equivalent to unet.apply (same products, reassociated sums). The
interleaved channel order (2c+p, not p*C+c) keeps GroupNorm groups contiguous,
so group_norm / group_norm_cat / FiLM / conv2d_cat all work unchanged on
folded tensors with transformed params. Only three places unfold: bottleneck
attention (token mixing is not fold-invariant), nearest-neighbor upsampling,
and the output head before pixel-shuffle.

Status: OPT-IN (ServingConfig.fold_w / SERVE_FOLD_W=1), default off. The
per-conv win is real and the transform is exact (tests/test_folded.py), but
whole-program the folded flagship measures 25.8 ms/step vs 21.5 unfolded at
512px b8: conv fusions halve (0.82 -> 0.41 ms) yet XLA inserts ~3 ms of extra
relayout copies around the fold/unfold boundaries (upsample paths are the
worst: each unfold at 256^2 costs ~0.5 ms) and the remaining fusions lose
epilogue fusion. Re-evaluate if XLA's layout assignment improves or if the
decoder upsample is re-expressed as an lhs-dilated conv that stays folded.

Derivation of the weight maps (1-D, W axis; H is untouched). Stride 1, SAME:
O[w] = sum_kx X[w+kx-1] W[kx]. The folded output phase p_o at folded column w'
is O[2w'+p_o], which reads X[2w'+p_o+kx-1] = folded column w'+jx-1, phase
p_in, giving the (p_o, kx) -> (jx, p_in) table in _FOLD_S1. Stride 2 (XLA
SAME on even sizes = pad 0_1): O[w] = sum_kx X[2w+kx]; the folded read lands
in columns 2w'+jx, which is again a window-3 stride-2 pad 0_1 conv (_FOLD_S2).
Each (jx, p_in, p_o) slot receives at most one original tap; the other half
of the folded weight stays zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import nn, unet

# (p_out, kx_orig) -> (kx_folded, p_in); stride-1 SAME (pad 1_1)
_FOLD_S1 = {
    (0, 0): (0, 1),
    (0, 1): (1, 0),
    (0, 2): (1, 1),
    (1, 0): (1, 0),
    (1, 1): (1, 1),
    (1, 2): (2, 0),
}
# stride-2, pad 0_1 (what XLA SAME produces for even sizes, kernel 3)
_FOLD_S2 = {
    (0, 0): (0, 0),
    (0, 1): (0, 1),
    (0, 2): (1, 0),
    (1, 0): (1, 0),
    (1, 1): (1, 1),
    (1, 2): (2, 0),
}


def fold_w(x: jax.Array) -> jax.Array:
    """[N,H,W,C] -> [N,H,W/2,2C]; folded channel index is 2c + (w % 2)."""
    n, h, w, c = x.shape
    assert w % 2 == 0, f"fold_w needs an even width, got {w}"
    return x.reshape(n, h, w // 2, 2, c).transpose(0, 1, 2, 4, 3).reshape(n, h, w // 2, 2 * c)


def unfold_w(x: jax.Array) -> jax.Array:
    """Inverse of fold_w: [N,H,W',2C] -> [N,H,2W',C]."""
    n, h, w2, c2 = x.shape
    c = c2 // 2
    return x.reshape(n, h, w2, c, 2).transpose(0, 1, 2, 4, 3).reshape(n, h, 2 * w2, c)


def _fold_conv3(w: jax.Array, stride: int = 1) -> jax.Array:
    """[kh,3,Ci,Co] -> [kh,3,2Ci,2Co] implementing the same conv on folds."""
    kh, kw, ci, co = w.shape
    assert kw == 3, kw
    table = _FOLD_S1 if stride == 1 else _FOLD_S2
    wf = jnp.zeros((kh, 3, 2 * ci, 2 * co), w.dtype)
    for (po, kx), (jx, pin) in table.items():
        wf = wf.at[:, jx, pin::2, po::2].set(w[:, kx])
    return wf


def _fold_conv1(w: jax.Array) -> jax.Array:
    """1x1 conv: phases don't mix -> block-diagonal over (p_in == p_out)."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (1, 1), (kh, kw)
    wf = jnp.zeros((1, 1, 2 * ci, 2 * co), w.dtype)
    for p in (0, 1):
        wf = wf.at[0, 0, p::2, p::2].set(w[0, 0])
    return wf


def _fold_conv(p: dict, stride: int = 1) -> dict:
    w = p["w"]
    wf = _fold_conv1(w) if w.shape[1] == 1 else _fold_conv3(w, stride)
    return {"w": wf, "b": jnp.repeat(p["b"], 2)}


def _fold_gn(p: dict) -> dict:
    # interleaved repeat keeps group spans contiguous: folded group g covers
    # {2c+p : c in original group g}
    return {"scale": jnp.repeat(p["scale"], 2), "bias": jnp.repeat(p["bias"], 2)}


def _fold_film(p: dict) -> dict:
    # film packs [gamma | beta] on the output axis; duplicate within each half
    w, b = p["w"], p["b"]
    ch = w.shape[1] // 2
    dup = lambda m: jnp.repeat(m, 2, axis=-1)
    return {
        "w": jnp.concatenate([dup(w[:, :ch]), dup(w[:, ch:])], axis=-1),
        "b": jnp.concatenate([dup(b[:ch]), dup(b[ch:])], axis=-1),
    }


def _fold_res_block(p: dict) -> dict:
    out = {
        "norm1": _fold_gn(p["norm1"]),
        "conv1": _fold_conv(p["conv1"]),
        "film": _fold_film(p["film"]),
        "norm2": _fold_gn(p["norm2"]),
        "conv2": _fold_conv(p["conv2"]),
    }
    if "skip" in p:
        out["skip"] = _fold_conv(p["skip"])
    return out


def _assert_gn_foldable(params: dict, groups: int) -> None:
    """Folded GroupNorm is equivalent only when doubling the channel count
    does not change the effective group count: _gn_groups(2C) == _gn_groups(C)
    makes each folded group exactly the interleaved fold of an original group.
    Current configs (C a multiple of norm_groups everywhere) satisfy this; a
    new config that violated it would silently diverge, so fail loudly."""

    def walk(node):
        if isinstance(node, dict):
            if set(node) == {"scale", "bias"} and node["scale"].ndim == 1:
                c = node["scale"].shape[0]
                assert nn._gn_groups(2 * c, groups) == nn._gn_groups(c, groups), (
                    f"GroupNorm over {c} channels is not fold-safe with "
                    f"norm_groups={groups}: folded group count "
                    f"{nn._gn_groups(2 * c, groups)} != {nn._gn_groups(c, groups)}"
                )
            else:
                for v in node.values():
                    walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)


def fold_params(params: dict, config: unet.UNetConfig) -> dict:
    """Map a trained unet param tree to its W-folded serving equivalent."""
    _assert_gn_foldable(params, config.norm_groups)
    out = {
        "cond_mlp1": params["cond_mlp1"],
        "cond_mlp2": params["cond_mlp2"],
        "stem": _fold_conv(params["stem"]),
        "enc": [],
        "dec": [],
        "head_norm": _fold_gn(params["head_norm"]),
        "head": _fold_conv(params["head"]),
    }
    for level_p in params["enc"]:
        lp = {"blocks": [_fold_res_block(bp) for bp in level_p["blocks"]]}
        if "down" in level_p:
            lp["down"] = _fold_conv(level_p["down"], stride=2)
        out["enc"].append(lp)
    mid = params["mid"]
    out["mid"] = {
        "block1": _fold_res_block(mid["block1"]),
        "attn": mid["attn"],  # attention runs unfolded
        "block2": _fold_res_block(mid["block2"]),
    }
    for level_p in params["dec"]:
        lp = {"blocks": [_fold_res_block(bp) for bp in level_p["blocks"]]}
        if "up" in level_p:
            lp["up"] = _fold_conv(level_p["up"])
        out["dec"].append(lp)
    return out


def fold_params_srnet(params: dict) -> dict:
    """Fold an SRNet (models/srnet.py) param tree: a pure stride-1 conv chain,
    so every weight folds and there are no stats/attention boundaries."""
    return {
        "stem": _fold_conv(params["stem"]),
        "blocks": [
            {"conv1": _fold_conv(bp["conv1"]), "conv2": _fold_conv(bp["conv2"])}
            for bp in params["blocks"]
        ],
        "pre_up": _fold_conv(params["pre_up"]),
        "up": _fold_conv(params["up"]),
    }


def apply_srnet(params: dict, x: jax.Array, config) -> jax.Array:
    """Folded SRNet forward; numerically equivalent to srnet.apply.

    The ideal fold case: the entire body is stride-1 convs + SiLU + residual
    adds (all fold-invariant), so the only boundaries are the 3-channel input
    fold and the 3*scale^2-channel head unfold — both trivial. Every c64 conv
    (17% MFU at tile shapes) runs as a c128 conv (~68% MFU)."""
    c = config
    xf = fold_w(x)
    h = nn.conv2d(params["stem"], xf)
    feat = h
    for bp in params["blocks"]:
        r = nn.conv2d(bp["conv1"], feat)
        r = nn.silu(r)
        r = nn.conv2d(bp["conv2"], r)
        feat = feat + 0.2 * r
    feat = nn.conv2d(params["pre_up"], feat) + h
    up = unfold_w(nn.conv2d(params["up"], feat))
    up = nn.pixel_shuffle(up, c.scale)
    return up + nn.upsample_nearest(x, c.scale)


def _upsample_nearest_folded(x: jax.Array) -> jax.Array:
    """Nearest x2 upsample mapping folded -> folded (factor 2 only).

    Y'[n,2h+a,w,2c+b] = X[n,h,w,c]: unfold W, duplicate rows, then the
    interleaved channel duplicate IS the W-fold of column duplication.
    """
    u = unfold_w(x)
    u = jnp.repeat(u, 2, axis=1)
    return jnp.repeat(u, 2, axis=-1)


def apply(
    params: dict,
    x: jax.Array,
    cond: jax.Array,
    t: jax.Array | None = None,
    config: unet.UNetConfig = unet.UNetConfig(),
) -> jax.Array:
    """Folded-layout forward; numerically equivalent to unet.apply.

    ``params`` must come from fold_params. Mirrors unet.apply line-for-line;
    every activation between the stem and the head lives in [N,H,W/2,2C]."""
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

    x_in = unet._space_to_depth(x, c.input_scale) if c.input_scale > 1 else x
    # each of the (levels-1) stride-2 convs halves the folded width and
    # _FOLD_S2 assumes the pre-stride width is even, so the network-input
    # width must carry 2^levels worth of factors of two
    assert x_in.shape[2] % (2 ** len(c.channel_mults)) == 0, (
        f"folded UNet needs input width (after space-to-depth) divisible by "
        f"{2 ** len(c.channel_mults)}, got {x_in.shape[2]}"
    )
    h = nn.conv2d(params["stem"], fold_w(x_in))

    skips = []
    for level_p in params["enc"]:
        for bp in level_p["blocks"]:
            h = unet._res_block(bp, h, emb, c.norm_groups)
        skips.append(h)
        if "down" in level_p:
            # folded stride-2: SAME on the (even) folded width is pad 0_1,
            # exactly the layout _FOLD_S2 was derived for
            h = nn.conv2d(level_p["down"], h, stride=2)

    mid = params["mid"]
    h = unet._res_block(mid["block1"], h, emb, c.norm_groups)
    if h.shape[1] * (h.shape[2] * 2) <= c.max_attn_tokens:  # static at trace time
        h = fold_w(nn.attention(mid["attn"], unfold_w(h), c.attn_heads))
    h = unet._res_block(mid["block2"], h, emb, c.norm_groups)

    for i, level_p in enumerate(params["dec"]):
        skip = skips[len(skips) - 1 - i]
        if h.shape[1] != skip.shape[1]:
            h = _upsample_nearest_folded(h)
        for j, bp in enumerate(level_p["blocks"]):
            h = unet._res_block(bp, h, emb, c.norm_groups, cat=skip if j == 0 else None)
        if "up" in level_p:
            h = nn.conv2d(level_p["up"], h)

    h = nn.group_norm(params["head_norm"], h, c.norm_groups)
    h = nn.silu(h)
    residual = unfold_w(nn.conv2d(params["head"], h))
    if c.input_scale > 1:
        residual = nn.pixel_shuffle(residual, c.input_scale)
    base = x if x.shape[-1] == c.out_channels else x[..., : c.out_channels]
    if c.residual_shrink > 0.0:
        r = residual.astype(jnp.float32)
        residual = jnp.sign(r) * jnp.maximum(jnp.abs(r) - c.residual_shrink, 0.0)
    return base + residual.astype(dtype)

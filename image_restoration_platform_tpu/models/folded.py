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
    for i, level_p in enumerate(params["dec"]):
        lp = {"blocks": [_fold_res_block(bp) for bp in level_p["blocks"]]}
        if "up" in level_p:
            lp["up"] = _fold_conv(level_p["up"])
        if i > 0:
            # every dec level after the first re-enters at half resolution;
            # its first block consumes up2(h) ++ skip. Pre-derive the fused
            # upsample phase kernels from the REAL x-part weights (the fold
            # of up-then-conv is not the up of the folded conv).
            b0 = level_p["blocks"][0]
            ci_x = b0["conv1"]["w"].shape[2] - b0["conv1"]["w"].shape[3]
            lp["up0"] = {
                "conv1_up": _fold_upconv(b0["conv1"]["w"][:, :, :ci_x, :]),
                "skip_up": _fold_upconv(b0["skip"]["w"][:, :, :ci_x, :]),
            }
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
    from . import srnet as _srnet

    return _srnet.residual_limit(x, up + nn.upsample_nearest(x, c.scale), c)


def _upsample_nearest_folded(x: jax.Array) -> jax.Array:
    """Nearest x2 upsample mapping folded -> folded (factor 2 only).

    Y'[n,2h+a,w,2c+b] = X[n,h,w,c]: unfold W, duplicate rows, then the
    interleaved channel duplicate IS the W-fold of column duplication.

    Kept for reference/tests; the serving decoder no longer uses it — the
    unfold here was the dominant fold-boundary relayout (~0.5 ms per decoder
    level at the 512px bucket), now fused into the phase convs below."""
    u = unfold_w(x)
    u = jnp.repeat(u, 2, axis=1)
    return jnp.repeat(u, 2, axis=-1)


# --------------------------------------------------- fold-preserving upsample
#
# The decoder's nearest-up2 -> conv composition, expressed WITHOUT leaving the
# folded layout. Key identities:
#
#   * conv(nearest_up2(x)) is linear and shift-equivariant with period 2: one
#     input (folded) column shift moves the output by two folded columns, so
#     the composite splits into 2x2 output phases (H phase g, folded-W phase
#     f), each a plain stride-1 conv on the folded input — all MXU work, no
#     relayout. Interleaving the four phase outputs back is a sublane/row
#     merge ([W',2] -> 2W', [H,2] -> 2H), never a lane (channel) shuffle.
#
#   * 1-D derivation (W axis; taps w[-1..1], u = nearest_up2(x)):
#       y[2p]   = w[-1]x[p-1] + (w[0]+w[1])x[p]
#       y[2p+1] = (w[-1]+w[0])x[p] + w[1]x[p+1]
#     With x itself folded (x[j] = X[j//2, phase j%2]) and the output folded
#     column p = 2q+f at phase e, each (f, e) slot reads at most two folded
#     columns of X — the _UPW tables below. The H axis is the same algebra
#     without the phase split (_UPH). Zero SAME padding maps correctly on
#     both axes (checked at the boundaries in tests/test_folded.py).
#
#   * GroupNorm and SiLU commute EXACTLY with nearest duplication (the value
#     multiset per group is unchanged up to a uniform multiplicity of 4), so
#     the decoder block's norm1 -> silu can run at the PRE-upsample
#     resolution and the upsample rides inside the phase convs for free.

# H axis, output row phase g: list of (dy_index, [original ky taps summed])
_UPH3 = {0: ((0, (0,)), (1, (1, 2))), 1: ((1, (0, 1)), (2, (2,)))}
# W axis, folded-output-column phase f: (dx_index, p_in, e_out, [kx taps])
_UPW3 = {
    0: ((0, 1, 0, (0,)), (1, 0, 0, (1, 2)), (1, 0, 1, (0, 1)), (1, 1, 1, (2,))),
    1: ((1, 0, 0, (0,)), (1, 1, 0, (1, 2)), (1, 1, 1, (0, 1)), (2, 0, 1, (2,))),
}


def _fold_upconv(w: jax.Array) -> jax.Array:
    """Real decoder weight [kh,kw,Ci,Co] (3x3 or 1x1) -> phase kernels
    [2,2,kh,kw,2Ci,2Co] such that applying them per (g, f) phase and
    interleaving equals fold(conv(nearest_up2(unfold(x))))."""
    kh, kw, ci, co = w.shape
    if (kh, kw) == (1, 1):
        h_taps = {g: ((0, (0,)),) for g in (0, 1)}
        w_taps = {f: ((0, f, 0, (0,)), (0, f, 1, (0,))) for f in (0, 1)}
    else:
        assert (kh, kw) == (3, 3), (kh, kw)
        h_taps, w_taps = _UPH3, _UPW3
    out = jnp.zeros((2, 2, kh, kw, 2 * ci, 2 * co), w.dtype)
    for g in (0, 1):
        for f in (0, 1):
            k = jnp.zeros((kh, kw, 2 * ci, 2 * co), w.dtype)
            for dy, kys in h_taps[g]:
                for dx, pin, e, kxs in w_taps[f]:
                    acc = sum(w[ky, kx] for ky in kys for kx in kxs)
                    k = k.at[dy, dx, pin::2, e::2].add(acc)
            out = out.at[g, f].set(k)
    return out


def _phase_conv(x: jax.Array, k: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        k.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def upconv2d_folded(kernels: jax.Array, x: jax.Array) -> jax.Array:
    """fold(conv(nearest_up2(unfold(x)))) via four stride-1 folded convs.

    ``kernels`` [2,2,kh,kw,2Ci,2Co] from _fold_upconv; x [N,H,W',2Ci] folded ->
    [N,2H,2W',2Co] folded. No bias (callers add it once)."""
    n, h, wf, _ = x.shape
    rows = []
    for g in (0, 1):
        o0 = _phase_conv(x, kernels[g, 0])
        o1 = _phase_conv(x, kernels[g, 1])
        co2 = o0.shape[-1]
        rows.append(jnp.stack([o0, o1], axis=3).reshape(n, h, 2 * wf, co2))
    return jnp.stack(rows, axis=2).reshape(n, 2 * h, 2 * wf, rows[0].shape[-1])


def _res_block_up(bp: dict, up_p: dict, x_lo: jax.Array, cat: jax.Array, emb, groups: int):
    """unet._res_block(bp, up2(x_lo), emb, groups, cat=cat) with the nearest
    upsample fused into the convolutions; x_lo stays at the pre-upsample
    folded resolution throughout the norm/activation and enters the level
    resolution only through the phase convs (upconv2d_folded).

    Virtual-concat GN over [up2(x_lo), cat]: duplication preserves per-channel
    moments exactly, so x's sums weigh 4x against cat's grid count."""
    n = x_lo.shape[0]
    cx, cc = x_lo.shape[-1], cat.shape[-1]
    ctot = cx + cc
    g = nn._gn_groups(ctot, groups)
    per = ctot // g
    hh, ww = cat.shape[1], cat.shape[2]
    cnt = hh * ww * per
    xf = x_lo.astype(jnp.float32)
    cf = cat.astype(jnp.float32)
    s1 = jnp.concatenate([4.0 * jnp.sum(xf, (1, 2)), jnp.sum(cf, (1, 2))], axis=-1)
    s2 = jnp.concatenate(
        [4.0 * jnp.sum(jnp.square(xf), (1, 2)), jnp.sum(jnp.square(cf), (1, 2))], axis=-1
    )
    mean_g = jnp.sum(s1.reshape(n, g, per), axis=-1) / cnt
    ex2_g = jnp.sum(s2.reshape(n, g, per), axis=-1) / cnt
    var_g = jnp.maximum(ex2_g - jnp.square(mean_g), 0.0)
    mean_c = jnp.repeat(mean_g, per, axis=-1)
    inv_c = jnp.repeat(jax.lax.rsqrt(var_g + 1e-5), per, axis=-1)
    scale = bp["norm1"]["scale"][None, :] * inv_c
    bias = bp["norm1"]["bias"][None, :] - mean_c * scale
    na = nn._apply_affine(x_lo, scale[:, :cx], bias[:, :cx])
    nb = nn._apply_affine(cat, scale[:, cx:], bias[:, cx:])

    h1 = upconv2d_folded(up_p["conv1_up"], nn.silu(na))
    h1 = h1 + _phase_conv(nn.silu(nb), bp["conv1"]["w"][:, :, cx:, :])
    h1 = h1 + bp["conv1"]["b"].astype(cat.dtype)
    h1 = nn.film(bp["film"], h1, emb)
    h1 = nn.group_norm(bp["norm2"], h1, groups)
    h1 = nn.silu(h1)
    h1 = nn.conv2d(bp["conv2"], h1)

    sp = upconv2d_folded(up_p["skip_up"], x_lo)
    sp = sp + _phase_conv(cat, bp["skip"]["w"][:, :, cx:, :])
    sp = sp + bp["skip"]["b"].astype(cat.dtype)
    return sp + h1


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
        blocks = level_p["blocks"]
        j0 = 0
        if h.shape[1] != skip.shape[1]:
            # fused nearest-up2: norm/silu at low res, upsample inside the
            # phase convs — the folded layout never breaks (no unfold)
            h = _res_block_up(blocks[0], level_p["up0"], h, skip, emb, c.norm_groups)
            j0 = 1
        for j in range(j0, len(blocks)):
            h = unet._res_block(blocks[j], h, emb, c.norm_groups, cat=skip if j == 0 else None)
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

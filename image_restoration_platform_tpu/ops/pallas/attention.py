"""Pallas bottleneck self-attention (flash-style, VMEM-resident K/V).

The UNet's bottleneck attends over T <= 4096 tokens with head_dim 64. Naive
XLA attention materializes the f32 [N, H, T, T] logits in HBM — profiled at
~2.2 GB of traffic per direction and ~6 ms of a 31 ms serving step at the
512px bucket. At these sizes the whole K/V for one (batch, head) is only
0.5 MB each, so the kernel keeps K/V resident in VMEM, blocks over queries,
and computes an exact (single-pass, full-row) softmax per query block:
logits never leave VMEM. HBM traffic drops to q/k/v/o (~34 MB total).

Grid: (N*H, T/BQ). Per step: q block [BQ, D] x K^T [D, T] -> f32 [BQ, T]
on the MXU, row softmax on the VPU, probs x V -> [BQ, D] on the MXU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import os

# Query block size and softmax-divide placement, overridable for the on-chip
# autotune (scripts/measure_attention.py). BQ=256 -> f32 logits block
# [256, 4096] = 4 MB VMEM. late_div defers the 1/sum normalization from the
# [BQ, T] probability matrix to the [BQ, D] output (T/D = 64x fewer VPU
# divides; exact up to bf16 rounding of the unnormalized probs, which like
# the normalized ones live in (0, 1] after the max subtraction).
#
# Defaults from the 2026-08-20 chip autotune (device event clocks, bf16
# [32, 4096, 64]): bq=256+late_div 2.126 ms (64.7 TFLOP/s) vs 2.231 early-
# divide and 2.221/2.346 at bq=128; bq=512 slower both ways; bq=1024 fails
# to compile (16 MB logits block exceeds VMEM). max|diff| vs early-divide
# 0.00098 = one bf16 level.
BQ = int(os.environ.get("PALLAS_ATTN_BQ", "256"))
LATE_DIV = os.environ.get("PALLAS_ATTN_LATE_DIV", "1") == "1"


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, late_div: bool):
    q = q_ref[0]  # [BQ, D] bf16
    k = k_ref[0]  # [T, D]
    v = v_ref[0]
    # logits on the MXU with f32 accumulation; stays in VMEM
    logits = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # [BQ, T]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p if late_div else p / s).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if late_div:
        out = out / s
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "bq", "late_div"))
def _attention_nh(q, k, v, interpret=False, bq=None, late_div=None):
    nh, t, d = q.shape
    bq = min(bq or BQ, t)
    if t % bq != 0:
        # Direct callers (the autotune sweep with a custom ATTN_T) would
        # otherwise get silently truncated output: grid=(nh, t // bq) drops
        # the tail tokens. flash_attention re-checks against the module BQ,
        # but this is the choke point every entry path goes through.
        raise ValueError(f"token count {t} must be a multiple of query block {bq}")
    late_div = LATE_DIV if late_div is None else late_div
    scale = 1.0 / math.sqrt(d)
    grid = (nh, t // bq)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, late_div=late_div),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((nh, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _naive_forward(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = (
        jnp.einsum("nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32) * scale
    )
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "nhqk,nhkd->nhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype), probs


@jax.custom_vjp
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """[N, H, T, D] q/k/v -> [N, H, T, D]; exact softmax(QK^T/sqrt(D))V.

    Forward runs the Pallas kernel (interpret mode on CPU so tests exercise
    the same logic; the TPU backend here reports itself as the 'axon'
    platform). Backward (training only, which runs at small token counts)
    recomputes attention in plain XLA and applies the exact softmax VJP.
    """
    n, h, t, d = q.shape
    if t % min(BQ, t) != 0:
        raise ValueError(f"token count {t} must be a multiple of the {BQ} query block")
    interpret = jax.default_backend() == "cpu"
    out = _attention_nh(
        q.reshape(n * h, t, d), k.reshape(n * h, t, d), v.reshape(n * h, t, d),
        interpret=interpret,
    )
    return out.reshape(n, h, t, d)


def _flash_fwd(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _flash_bwd(residuals, dout):
    q, k, v = residuals
    scale = 1.0 / math.sqrt(q.shape[-1])
    _, probs = _naive_forward(q, k, v)  # f32 [N,H,T,T]
    do = dout.astype(jnp.float32)
    dv = jnp.einsum("nhqk,nhqd->nhkd", probs, do)
    dp = jnp.einsum("nhqd,nhkd->nhqk", do, v.astype(jnp.float32))
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("nhqk,nhkd->nhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("nhqk,nhqd->nhkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_flash_fwd, _flash_bwd)

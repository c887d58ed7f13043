"""Device-side image statistics (fused into the classifier program).

Replaces sharp's .stats() per-channel mean/stdev and the JS variance helpers
(classifier.js:262-286). All reductions are f32 on device and fuse with the
stencil producers under one jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def flat_variance(x: jax.Array) -> jax.Array:
    """Population variance over every element (classifier.js:262-266)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x)
    return jnp.mean(jnp.square(x - mean))


def flat_std(x: jax.Array) -> jax.Array:
    return jnp.sqrt(flat_variance(x))


def channel_stats(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-channel (mean, stdev) of an [H, W, C] byte-range image.

    Mirrors sharp .stats().channels[*].{mean,stdev} (classifier.js:52).
    Returns two [C] f32 vectors.
    """
    x = img.astype(jnp.float32)
    mean = jnp.mean(x, axis=(0, 1))
    var = jnp.mean(jnp.square(x - mean[None, None, :]), axis=(0, 1))
    return mean, jnp.sqrt(var)

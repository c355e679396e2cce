"""Dynamic-range utilities (reference src/utils/util_data.py:116-143).

The PSO fitness path rescales each generated image to [0,1] using that
image's own min/max (reference src/pso/util_discovery.py:48 →
src/utils/util_data.py:129-135, called on a batch of ONE). When the whole
swarm is evaluated as a single device batch, the reduction must stay
*per-sample* — `rescale01_per_sample` reduces over all non-batch axes only
(SURVEY.md §3.1 "semantics to preserve").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rescale01(img: jax.Array, min_val=None, max_val=None) -> jax.Array:
    """Global min-max rescale (reference rescale_torch, util_data.py:129-135).

    NB: the reference uses `if not min_val` — a passed min of 0(.0) falls back
    to the tensor min. We keep None-only semantics (the sane reading); no
    call site in the reference passes 0 explicitly."""
    if min_val is None:
        min_val = jnp.min(img)
    if max_val is None:
        max_val = jnp.max(img)
    return (img - min_val) / (max_val - min_val)


def rescale01_per_sample(imgs: jax.Array) -> jax.Array:
    """Per-sample min-max rescale of a batch [N, ...] to [0,1].

    Equivalent to the reference's batch-1 `rescale_torch` applied N times,
    but as one fused VPU pass over the whole swarm batch."""
    reduce_axes = tuple(range(1, imgs.ndim))
    mn = jnp.min(imgs, axis=reduce_axes, keepdims=True)
    mx = jnp.max(imgs, axis=reduce_axes, keepdims=True)
    # TPU fma contraction can overshoot by 1 ulp at x == mx (observed
    # 1.0000001 on v5e); the fitness path asserts output ∈ [0,1]
    # (reference src/pso/util_discovery.py:63-64), so clamp.
    return jnp.clip((imgs - mn) / (mx - mn), 0.0, 1.0)


def adjust_dynamic_range(data: jax.Array, drange_in, drange_out) -> jax.Array:
    """Affine drange map (reference src/utils/util_data.py:116-121)."""
    if tuple(drange_in) == tuple(drange_out):
        return data
    scale = (jnp.float32(drange_out[1]) - jnp.float32(drange_out[0])) / (
        jnp.float32(drange_in[1]) - jnp.float32(drange_in[0])
    )
    bias = jnp.float32(drange_out[0]) - jnp.float32(drange_in[0]) * scale
    return data * scale + bias


def postprocess_uint8(images: jax.Array, min_val=-1.0, max_val=1.0) -> jax.Array:
    """[min,max] floats → uint8 [0,255] with the reference's +0.5 rounding
    (reference src/inverter/utils_ae/util_inverter.py:497-522)."""
    images = (images - min_val) * 255.0 / (max_val - min_val)
    return jnp.clip(images + 0.5, 0, 255).astype(jnp.uint8)

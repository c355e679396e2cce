"""Pallas TPU kernel: fused per-sample min-max rescale (+ optional cast).

The discovery-fitness chain rescales every generated image to [0, 1] by its
own min/max before the assessor forward (ops/rescale.py:
rescale01_per_sample, reference src/utils/util_data.py:129-135 applied per
sample). XLA emits this as a multi-pass fusion in the image's native
[N, 1, 28, 28] layout, where each 28-element row occupies a 128-lane
register — ~4.6x padded traffic per pass (profiled at ~19 us/iteration of
the flagship program vs a ~2 us bandwidth bound; docs/BENCH.md).

This kernel operates on the flattened [N, F] view instead: one pass reads
each sample row at full lane utilization, computes its min/max, normalizes,
clamps to [0, 1] (fma contraction can overshoot by 1 ulp at x == max), and
writes the result — optionally already cast to the fast-math dtype so the
downstream conv reads half the bytes. The feature axis is padded to the
128-lane tile with +inf/-inf neutral elements for the two reductions.

Numerics match ops.rescale.rescale01_per_sample bit-for-bit at f32
(asserted in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(x_ref, out_ref, *, n_feat: int, out_dtype):
    x = x_ref[:]  # [bn, f_pad] f32
    bn, f_pad = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, f_pad), 1)
    valid = col < n_feat
    mn = jnp.min(jnp.where(valid, x, _INF), axis=1, keepdims=True)
    mx = jnp.max(jnp.where(valid, x, -_INF), axis=1, keepdims=True)
    y = jnp.clip((x - mn) / (mx - mn), 0.0, 1.0)
    out_ref[:] = y.astype(out_dtype)


def rescale01_rows(x: jax.Array, out_dtype=None, block_n: int = 128,
                   interpret: bool | None = None) -> jax.Array:
    """Per-row min-max rescale of [N, F] to [0, 1], one fused VMEM pass.

    out_dtype casts the result in-kernel (e.g. jnp.bfloat16 on the
    fast-math path). N and F are padded to TPU tiles internally.
    interpret=None auto-selects interpret mode off-TPU (CPU has no Mosaic
    lowering)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, f = x.shape
    out_dtype = out_dtype or x.dtype
    f_pad = _round_up(f, 128)
    bn = min(block_n, _round_up(n, 8))
    n_pad = _round_up(n, bn)
    xp = x.astype(jnp.float32)
    if (n_pad, f_pad) != (n, f):
        xp = jnp.pad(xp, ((0, n_pad - n), (0, f_pad - f)))
    out = pl.pallas_call(
        functools.partial(_kernel, n_feat=f, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), out_dtype),
        grid=(n_pad // bn,),
        in_specs=[pl.BlockSpec((bn, f_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, f_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp)
    return out[:n, :f]


def rescale01_per_sample_pallas(imgs: jax.Array, out_dtype=None) -> jax.Array:
    """Drop-in for ops.rescale.rescale01_per_sample on [N, C, H, W] batches
    (+ in-kernel cast). Flattens the per-sample axes for full-lane traffic
    and restores the shape afterwards."""
    n = imgs.shape[0]
    flat = rescale01_rows(imgs.reshape(n, -1), out_dtype=out_dtype)
    return flat.reshape(imgs.shape)

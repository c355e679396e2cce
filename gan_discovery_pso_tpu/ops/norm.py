"""BatchNorm with torch's exact train/eval semantics, as pure functions.

The reference leans on `nn.BatchNorm2d` defaults everywhere (generator
blocks, ResNet assessor, CAE): eps=1e-5, momentum=0.1, affine, running
stats. Torch's subtleties we reproduce (SURVEY.md §7 hard-part #1):

- train mode normalizes with the *biased* batch variance but updates
  running_var with the *unbiased* variance;
- running = (1 - momentum)·running + momentum·batch  (torch's momentum is
  the weight of the NEW observation — the opposite of flax's convention);
- eval mode normalizes with running stats only.

State is explicit: `BatchNormStats` pytrees thread through train steps, so
the whole model stays a pure function and jit/pjit can fuse the normalize
into neighboring convs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BatchNormStats(NamedTuple):
    mean: jax.Array  # (C,)
    var: jax.Array  # (C,)

    @classmethod
    def init(cls, channels: int, dtype=jnp.float32) -> "BatchNormStats":
        return cls(jnp.zeros((channels,), dtype), jnp.ones((channels,), dtype))


def batch_norm_train(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    stats: BatchNormStats,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axes: tuple = (0, 2, 3),
) -> tuple[jax.Array, BatchNormStats]:
    """Training-mode BN over NCHW (reduce N,H,W). Returns (y, new_stats).

    Statistics are always computed in fp32 (a no-op for fp32 inputs; for the
    bf16 mixed-precision train path, batch mean/var reductions in bf16 lose
    enough mantissa to corrupt the running stats). The fp32 computation stays
    internal: both the normalized output and the returned running stats are
    cast back to their incoming dtypes, so the state pytree's dtype is stable
    across steps (callers threading BN state through a scan/while carry or a
    low-precision checkpoint would otherwise hit dtype mismatches)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.var(xf, axis=axes)  # biased — used for normalization
    # element count per channel = product of the REDUCED axes' sizes (not
    # size//shape[1], which silently assumes the channel axis is 1)
    n = 1
    for ax in axes:
        n *= x.shape[ax]
    unbiased = var * (n / max(n - 1, 1))  # used for the running update
    shape = _bshape(x, axes)
    inv = jax.lax.rsqrt(var.reshape(shape) + eps)
    y = (xf - mean.reshape(shape)) * inv \
        * scale.astype(jnp.float32).reshape(shape) \
        + bias.astype(jnp.float32).reshape(shape)
    new_stats = BatchNormStats(
        mean=((1.0 - momentum) * stats.mean.astype(jnp.float32)
              + momentum * mean).astype(stats.mean.dtype),
        var=((1.0 - momentum) * stats.var.astype(jnp.float32)
             + momentum * unbiased).astype(stats.var.dtype),
    )
    return y.astype(x.dtype), new_stats


def batch_norm_eval(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    stats: BatchNormStats,
    eps: float = 1e-5,
    axes: tuple = (0, 2, 3),
) -> jax.Array:
    """Eval-mode BN: normalize with running stats (fused affine)."""
    shape = _bshape(x, axes)
    inv = jax.lax.rsqrt(stats.var.reshape(shape) + eps)
    return (x - stats.mean.reshape(shape)) * inv * scale.reshape(shape) + bias.reshape(
        shape
    )


def _bshape(x: jax.Array, axes: tuple) -> tuple:
    """Broadcast shape placing C on the single non-reduced axis."""
    return tuple(1 if i in axes else x.shape[i] for i in range(x.ndim))

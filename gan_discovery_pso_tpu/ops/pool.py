"""Pooling with torch shape semantics (floor mode, explicit padding).

Used by the ResNet assessor (MaxPool2d(3, 2, 1) stem and the
`AdaptiveMaxPool2d((1,1))` head — a MAX pool despite the attribute being
named `avgpool`, reference src/pso/util_cnn.py:88,99) and AlexNet's
MaxPool2d((2,2)) (reference src/pso/util_cnn.py:201).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool2d(
    x: jax.Array,
    kernel_size: int | tuple[int, int],
    stride: int | tuple[int, int] | None = None,
    padding: int | tuple[int, int] = 0,
) -> jax.Array:
    """torch.nn.functional.max_pool2d (NCHW, ceil_mode=False).

    Padding uses -inf so padded cells never win the max (torch semantics)."""
    k = _pair(kernel_size)
    s = _pair(stride) if stride is not None else k
    p = _pair(padding)
    if k == s and p == (0, 0):
        # Non-overlapping unpadded pool (AlexNet's MaxPool2d(2,2) × 4): a
        # reshape-max is bit-identical (floor mode drops the ragged tail,
        # exactly torch ceil_mode=False) and its VJP is a cheap mask.
        # reduce_window's VJP lowers to select-and-scatter, which XLA
        # compiles pathologically slowly (measured: 147 s for ONE 2×2 pool
        # backward on XLA:CPU; four of them made the AlexNet train step
        # effectively uncompilable).
        n, c, h, w = x.shape
        oh, ow = h // k[0], w // k[1]
        x = x[:, :, : oh * k[0], : ow * k[1]]
        return x.reshape(n, c, oh, k[0], ow, k[1]).max(axis=(3, 5))
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 1, k[0], k[1]),
        window_strides=(1, 1, s[0], s[1]),
        padding=((0, 0), (0, 0), (p[0], p[0]), (p[1], p[1])),
    )


def adaptive_max_pool2d(x: jax.Array, output_size: tuple[int, int] = (1, 1)) -> jax.Array:
    """torch.nn.AdaptiveMaxPool2d. Only the (1,1) global case is needed by the
    reference (src/pso/util_cnn.py:99); general sizes fall back to exact
    torch bin arithmetic."""
    if output_size == (1, 1):
        return jnp.max(x, axis=(2, 3), keepdims=True)
    oh, ow = output_size
    n, c, h, w = x.shape
    # torch bins: start = floor(i*H/oh), end = ceil((i+1)*H/oh)
    rows = [
        jnp.max(x[:, :, (i * h) // oh : -(-(i + 1) * h // oh), :], axis=2, keepdims=True)
        for i in range(oh)
    ]
    x = jnp.concatenate(rows, axis=2)
    cols = [
        jnp.max(x[:, :, :, (j * w) // ow : -(-(j + 1) * w // ow)], axis=3, keepdims=True)
        for j in range(ow)
    ]
    return jnp.concatenate(cols, axis=3)


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))

"""Pooling with torch shape semantics (floor mode, explicit padding).

Used by the ResNet assessor (MaxPool2d(3, 2, 1) stem and the
`AdaptiveMaxPool2d((1,1))` head — a MAX pool despite the attribute being
named `avgpool`, reference src/pso/util_cnn.py:88,99) and AlexNet's
MaxPool2d((2,2)) (reference src/pso/util_cnn.py:201).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _window_view(x: jax.Array, k0: int, k1: int) -> jax.Array:
    """[N,C,oh*k0,ow*k1] → [N,C,oh,ow,k0*k1], window elements in (k0,k1)
    row-major order — torch's maxpool window scan order."""
    n, c, h, w = x.shape
    oh, ow = h // k0, w // k1
    return (
        x.reshape(n, c, oh, k0, ow, k1)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(n, c, oh, ow, k0 * k1)
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _nonoverlap_max_pool(x: jax.Array, k0: int, k1: int) -> jax.Array:
    """Non-overlapping unpadded max pool via reshape-max, with a VJP that
    routes the whole cotangent to the FIRST maximal element per window.

    The plain reshape-`.max()` VJP splits the gradient evenly among tied
    window values; torch's maxpool backward (and lax.reduce_window's
    select-and-scatter) send it all to the first max in window scan order.
    Ties are common on this workload (flat image backgrounds give exactly
    equal fp32 activations), so the tie rule is part of the torch-parity
    contract for assessor training gradients."""
    return _window_view(x, k0, k1).max(axis=-1)


def _nonoverlap_max_pool_fwd(x, k0, k1):
    xw = _window_view(x, k0, k1)
    idx = jnp.argmax(xw, axis=-1)  # first max — torch/select-and-scatter rule
    out = jnp.take_along_axis(xw, idx[..., None], axis=-1)[..., 0]
    return out, (idx, x.shape)


def _nonoverlap_max_pool_bwd(k0, k1, res, g):
    idx, (n, c, h, w) = res
    oh, ow = h // k0, w // k1
    gw = jax.nn.one_hot(idx, k0 * k1, dtype=g.dtype) * g[..., None]
    gx = (
        gw.reshape(n, c, oh, ow, k0, k1)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(n, c, oh * k0, ow * k1)
    )
    return (gx,)


_nonoverlap_max_pool.defvjp(_nonoverlap_max_pool_fwd, _nonoverlap_max_pool_bwd)


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
        # exactly torch ceil_mode=False). reduce_window's VJP lowers to
        # select-and-scatter, which XLA compiles pathologically slowly
        # (measured: 147 s for ONE 2×2 pool backward on XLA:CPU; four of
        # them made the AlexNet train step effectively uncompilable).
        # _nonoverlap_max_pool carries a custom VJP with torch's
        # first-max-wins tie rule (a plain reshape-max would split tied
        # gradients evenly).
        n, c, h, w = x.shape
        oh, ow = h // k[0], w // k[1]
        x = x[:, :, : oh * k[0], : ow * k[1]]
        return _nonoverlap_max_pool(x, k[0], k[1])
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

"""Convolution primitives with PyTorch's exact shape/padding semantics.

The reference models are defined in terms of torch `Conv2d` /
`ConvTranspose2d` arithmetic (e.g. the DCGAN generator's 1→7→14→28
ConvTranspose ladder, reference src/utils/util_dcgan.py:128-149, and the CAE
decoder's mixed `output_padding`, src/evaluation/util_cae.py:150-158). To
reproduce those architectures bit-for-bit at fp32 we implement both ops
directly on `lax.conv_general_dilated` with explicit padding:

- conv2d:       out = floor((i + 2p - k) / s) + 1
- conv_transpose2d(k, s, p, op): out = (i - 1)·s - 2p + k + op,
  realized as an input-dilated convolution with spatially flipped kernel and
  per-edge padding (k - 1 - p, k - 1 - p + op) — the textbook-exact
  equivalent of torch's transposed conv (gradient of conv wrt its input).

Weight layouts follow torch so parity tests can inject torch state dicts
unmodified: conv2d weight (O, I, kH, kW); conv_transpose2d weight
(I, O, kH, kW). XLA picks MXU-friendly physical layouts regardless of the
logical layout, so this costs nothing on TPU.

Everything here is shape-static and fuses under jit; the MXU does the work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# NCHW activations, OIHW kernels — torch's logical layout.
_DIMS = ("NCHW", "OIHW", "NCHW")

# fp32 output fidelity vs the torch reference is the parity contract
# (BASELINE.md): JAX's default conv precision is reduced (bf16 passes), so
# every op here requests full fp32 accumulation by default. The opt-in
# bf16 fast path flips this at trace time (ops/precision.fast_math).
from gan_discovery_pso_tpu.ops.precision import default_precision


def conv2d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    *,
    preferred_dtype=jnp.float32,
    precision=None,
) -> jax.Array:
    """torch.nn.functional.conv2d equivalent (NCHW, OIHW weight)."""
    if precision is None:
        precision = default_precision()
    # mixed precision: multiply in the weights' dtype (bf16 on the fast
    # path), accumulate in preferred_dtype (fp32) — the MXU-native recipe
    if x.dtype != weight.dtype:
        x = x.astype(weight.dtype)
    s = _pair(stride)
    p = _pair(padding)
    out = lax.conv_general_dilated(
        x,
        weight,
        window_strides=s,
        padding=((p[0], p[0]), (p[1], p[1])),
        dimension_numbers=_DIMS,
        preferred_element_type=preferred_dtype,
        precision=precision,
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out


def conv_transpose2d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    output_padding: int | tuple[int, int] = 0,
    *,
    preferred_dtype=jnp.float32,
    precision=None,
) -> jax.Array:
    """torch.nn.functional.conv_transpose2d equivalent.

    weight layout (I, O, kH, kW) — torch's ConvTranspose2d layout.
    """
    if precision is None:
        precision = default_precision()
    if x.dtype != weight.dtype:
        x = x.astype(weight.dtype)
    s = _pair(stride)
    p = _pair(padding)
    op = _pair(output_padding)
    kh, kw = weight.shape[2], weight.shape[3]
    if op[0] >= s[0] or op[1] >= s[1]:
        raise ValueError("output_padding must be smaller than stride")

    # Transposed conv == conv over an input dilated by `stride`, with the
    # kernel flipped in both spatial dims and its I/O axes swapped, padded by
    # (k-1-p) low / (k-1-p+output_padding) high on each spatial edge.
    kernel = jnp.flip(weight, axis=(2, 3)).swapaxes(0, 1)  # -> (O, I, kH, kW)
    pad = (
        (kh - 1 - p[0], kh - 1 - p[0] + op[0]),
        (kw - 1 - p[1], kw - 1 - p[1] + op[1]),
    )
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=s,
        dimension_numbers=_DIMS,
        preferred_element_type=preferred_dtype,
        precision=precision,
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out


def conv2d_out_shape(i: int, k: int, s: int, p: int) -> int:
    return (i + 2 * p - k) // s + 1


def conv_transpose2d_out_shape(i: int, k: int, s: int, p: int, op: int = 0) -> int:
    return (i - 1) * s - 2 * p + k + op


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))

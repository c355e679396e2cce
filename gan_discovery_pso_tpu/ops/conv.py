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

Alternate lowerings (exact re-associations of the same sums, equivalence-
tested vs torch forward+grad in tests/test_conv_lowering.py) are available
but OFF by default — measured on v5e, XLA:TPU's native conv emitter already
handles these shapes at full speed and the rewrites only add fusion
boundaries (see docs/BENCH.md "Negative results"):

- conv_transpose2d GDPT_CONVT_LOWERING: 'dilated' (default; the classic
  input-dilated conv), 'auto' (einsum for 1x1-spatial inputs + subpixel/
  polyphase decomposition for stride>1 — measured 19-40% slower on the
  flagship), 'einsum1x1' (einsum for 1x1 inputs only — ±3%, noise-level),
  or force 'einsum'/'subpixel' per call via the lowering= kwarg.
- conv2d GDPT_CONV_LOWERING: 'direct' (default), 'auto'/'s2d' folds
  small-contraction strided convs (C_in*k*k <= 128, e.g. the ResNet stem's
  1-channel 7x7/s2) through space-to-depth — measured neutral (±1%).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

# NCHW activations, OIHW kernels — torch's logical layout.
_DIMS = ("NCHW", "OIHW", "NCHW")

# fp32 output fidelity vs the torch reference is the parity contract
# (BASELINE.md): JAX's default conv precision is reduced (bf16 passes), so
# every op here requests full fp32 accumulation by default. The opt-in
# bf16 fast path flips this at trace time (ops/precision.fast_math).
from gan_discovery_pso_tpu.ops.precision import default_precision, resolve_accum_dtype


def conv2d(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    *,
    preferred_dtype=jnp.float32,
    precision=None,
    lowering: str | None = None,
) -> jax.Array:
    """torch.nn.functional.conv2d equivalent (NCHW, OIHW weight).

    lowering: None → $GDPT_CONV_LOWERING (default 'direct'); 'auto'/'s2d'
    route small-contraction strided convs through space-to-depth
    (_conv2d_s2d; measured neutral on v5e — see docs/BENCH.md).
    """
    if precision is None:
        precision = default_precision()
    # mixed precision: multiply in the weights' dtype (bf16 on the fast
    # path), accumulate in preferred_dtype (fp32) — the MXU-native recipe;
    # under precision.lowp_io() bf16 operands keep bf16 outputs (AD-safe)
    if x.dtype != weight.dtype:
        x = x.astype(weight.dtype)
    preferred_dtype = resolve_accum_dtype(x.dtype, preferred_dtype)
    s = _pair(stride)
    p = _pair(padding)
    if lowering is None:
        lowering = os.environ.get("GDPT_CONV_LOWERING", "direct")
    cin, kh, kw = weight.shape[1], weight.shape[2], weight.shape[3]
    use_s2d = lowering == "s2d" or (
        lowering == "auto"
        and (s[0] > 1 or s[1] > 1)
        and x.shape[2] % s[0] == 0
        and x.shape[3] % s[1] == 0
        and cin * kh * kw <= 128
    )
    if use_s2d:
        out = _conv2d_s2d(x, weight, s, p, preferred_dtype, precision)
    else:
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


def _conv2d_s2d(x, weight, s, p, preferred_dtype, precision):
    """Space-to-depth lowering of a strided conv (exact re-association).

    x[n,c,s·u+dy,s·v+dx] folds to X[n,(c,dy,dx),u,v]; the kernel tap at
    spatial index t maps to sub-kernel position (t + off) // s, channel
    (t + off) % s, with off = s·ceil(p/s) - p zero-padding on the low edge
    so every output pixel's window starts on a block boundary.
    """
    n, c, h, w = x.shape
    o, _, kh, kw = weight.shape
    sh, sw = s
    ph, pw = p
    hs, ws = h // sh, w // sw
    xf = x.reshape(n, c, hs, sh, ws, sw).transpose(0, 1, 3, 5, 2, 4)
    xf = xf.reshape(n, c * sh * sw, hs, ws)

    dh, dw = -(-ph // sh), -(-pw // sw)  # block-aligned low pad (u-space)
    off_h, off_w = dh * sh - ph, dw * sw - pw
    k2h, k2w = -(-(kh + off_h) // sh), -(-(kw + off_w) // sw)
    wpad = jnp.pad(
        weight,
        ((0, 0), (0, 0),
         (off_h, k2h * sh - kh - off_h), (off_w, k2w * sw - kw - off_w)),
    )
    w2 = wpad.reshape(o, c, k2h, sh, k2w, sw).transpose(0, 1, 3, 5, 2, 4)
    w2 = w2.reshape(o, c * sh * sw, k2h, k2w)

    out_h = (h + 2 * ph - kh) // sh + 1
    out_w = (w + 2 * pw - kw) // sw + 1
    hi_h = out_h - 1 + k2h - dh - hs
    hi_w = out_w - 1 + k2w - dw - ws
    out = lax.conv_general_dilated(
        xf,
        w2,
        window_strides=(1, 1),
        padding=((dh, max(hi_h, 0)), (dw, max(hi_w, 0))),
        dimension_numbers=_DIMS,
        preferred_element_type=preferred_dtype,
        precision=precision,
    )
    return out[:, :, :out_h, :out_w]


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
    lowering: str | None = None,
) -> jax.Array:
    """torch.nn.functional.conv_transpose2d equivalent.

    weight layout (I, O, kH, kW) — torch's ConvTranspose2d layout.

    lowering: None → $GDPT_CONVT_LOWERING (default 'dilated', the classic
    input-dilated conv — fastest on v5e, see docs/BENCH.md); 'auto' picks
    the einsum form for 1x1-spatial inputs and the subpixel decomposition
    for stride>1 (both zero-free, exact); 'einsum1x1' uses einsum for 1x1
    inputs only; 'einsum'/'subpixel' force those forms.
    """
    if precision is None:
        precision = default_precision()
    if x.dtype != weight.dtype:
        x = x.astype(weight.dtype)
    preferred_dtype = resolve_accum_dtype(x.dtype, preferred_dtype)
    s = _pair(stride)
    p = _pair(padding)
    op = _pair(output_padding)
    kh, kw = weight.shape[2], weight.shape[3]
    if op[0] >= s[0] or op[1] >= s[1]:
        raise ValueError("output_padding must be smaller than stride")

    if lowering is None:
        lowering = os.environ.get("GDPT_CONVT_LOWERING", "dilated")
    if lowering == "einsum" or (
        lowering in ("auto", "einsum1x1") and x.shape[2] == 1 and x.shape[3] == 1
    ):
        out = _convt_einsum(x, weight, p, op, preferred_dtype, precision)
    elif lowering == "subpixel" or (lowering == "auto" and (s[0] > 1 or s[1] > 1)):
        out = _convt_subpixel(x, weight, s, p, op, preferred_dtype, precision)
    else:
        # Transposed conv == conv over an input dilated by `stride`, with the
        # kernel flipped in both spatial dims and its I/O axes swapped, padded
        # by (k-1-p) low / (k-1-p+output_padding) high on each spatial edge.
        kernel = jnp.flip(weight, axis=(2, 3)).swapaxes(0, 1)  # (O, I, kH, kW)
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


def _crop_or_pad(full, p, out_hw):
    """Apply the transposed conv's `padding` crop (+ high-side zero extension
    when output_padding exceeds it) along both spatial axes."""
    ph, pw = p
    oh, ow = out_hw
    hi_h = ph + oh - full.shape[2]
    hi_w = pw + ow - full.shape[3]
    if hi_h > 0 or hi_w > 0:
        full = jnp.pad(full, ((0, 0), (0, 0), (0, max(hi_h, 0)), (0, max(hi_w, 0))))
    return full[:, :, ph:ph + oh, pw:pw + ow]


def _convt_einsum(x, weight, p, op, preferred_dtype, precision):
    """1x1-spatial transposed conv == one matmul: out[n,o,y,x] = Σ_i z[n,i]·
    w[i,o,y,x] (the kernel is stamped once per sample). The dilated form
    instead convolves a k-padded 1x1 image — k·k MACs per output position
    with one real tap each."""
    if x.shape[2] != 1 or x.shape[3] != 1:
        raise ValueError(
            "lowering='einsum' requires a 1x1-spatial input (got "
            f"{x.shape[2]}x{x.shape[3]}); use 'einsum1x1' to apply it only "
            "where valid, or 'dilated'/'subpixel'."
        )
    kh, kw = weight.shape[2], weight.shape[3]
    full = jnp.einsum(
        "ni,iohw->nohw",
        x[:, :, 0, 0],
        weight,
        precision=precision,
        preferred_element_type=preferred_dtype,
    )
    return _crop_or_pad(full, p, (kh - 2 * p[0] + op[0], kw - 2 * p[1] + op[1]))


def _convt_subpixel(x, weight, s, p, op, preferred_dtype, precision):
    """Subpixel (polyphase) decomposition of a fractionally-strided conv.

    The zero-free identity: with y = s·q + r, the full (pad-0) transposed
    conv is out[s·q + r] = Σ_t x[q − t]·w[r + s·t] — one stride-1 conv per
    residue r with the flipped sub-kernel w[r::s], interleaved along the
    spatial axis. The dilated form multiplies the s−1 inserted zeros in
    every window instead (k²/⌈k/s⌉² more MACs than needed)."""
    n, cin, h, w = x.shape
    cout = weight.shape[1]
    sh, sw = s
    kh, kw = weight.shape[2], weight.shape[3]
    full_h, full_w = (h - 1) * sh + kh, (w - 1) * sw + kw
    t_h = [-(-(kh - r) // sh) if r < kh else 0 for r in range(sh)]
    t_w = [-(-(kw - r) // sw) if r < kw else 0 for r in range(sw)]
    qh = max(h + max(t_h) - 1, 1)
    qw = max(w + max(t_w) - 1, 1)

    rows = []
    for rh in range(sh):
        cols = []
        for rw in range(sw):
            th, tw = t_h[rh], t_w[rw]
            if th == 0 or tw == 0:
                cols.append(jnp.zeros((n, cout, qh, qw),
                                      preferred_dtype or x.dtype))
                continue
            sub = weight[:, :, rh::sh, rw::sw]  # (I, O, th, tw)
            kernel = jnp.flip(sub, axis=(2, 3)).swapaxes(0, 1)  # (O, I, th, tw)
            y = lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(1, 1),
                padding=((th - 1, th - 1), (tw - 1, tw - 1)),
                dimension_numbers=_DIMS,
                preferred_element_type=preferred_dtype,
                precision=precision,
            )  # (n, cout, h+th-1, w+tw-1)
            y = jnp.pad(
                y, ((0, 0), (0, 0), (0, qh - y.shape[2]), (0, qw - y.shape[3]))
            )
            cols.append(y)
        rows.append(jnp.stack(cols, axis=-1))  # (n, cout, qh, qw, sw)
    full = jnp.stack(rows, axis=3)  # (n, cout, qh, sh, qw, sw)
    full = full.reshape(n, cout, qh * sh, qw * sw)[:, :, :full_h, :full_w]
    out_h = (h - 1) * sh - 2 * p[0] + kh + op[0]
    out_w = (w - 1) * sw - 2 * p[1] + kw + op[1]
    return _crop_or_pad(full, p, (out_h, out_w))


def conv2d_out_shape(i: int, k: int, s: int, p: int) -> int:
    return (i + 2 * p - k) // s + 1


def conv_transpose2d_out_shape(i: int, k: int, s: int, p: int, op: int = 0) -> int:
    return (i - 1) * s - 2 * p + k + op


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))

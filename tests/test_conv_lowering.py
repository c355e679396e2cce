"""Equivalence of the alternate conv lowerings against torch and against
each other (forward AND gradients).

ops/conv.py offers opt-in zero-free transposed-conv lowerings (einsum for
1x1 inputs, subpixel/polyphase for stride>1) and a space-to-depth fold for
small-contraction strided convs. They measured no faster than XLA:TPU's
native emitter on v5e (docs/BENCH.md "Negative results") so the classic
forms stay default, but each is an exact re-association of the same sums;
these tests pin that across the model shape zoo plus adversarial shapes
(stride > kernel, asymmetric output_padding, odd sizes).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.ops import conv2d, conv_transpose2d

RTOL, ATOL = 1e-5, 1e-5
# gradients sum hundreds of fp32 products per tap; reassociation between
# lowerings gives ~1e-5 absolute noise on O(50) magnitudes
GRTOL, GATOL = 1e-4, 1e-4


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


CONVT_SHAPES = [
    # (cin, cout, k, s, p, op, hw) — model zoo
    (100, 128, 7, 1, 0, 0, 1),  # G block 1 (einsum path)
    (128, 64, 4, 2, 1, 0, 7),  # G block 2 (subpixel)
    (64, 1, 4, 2, 1, 0, 14),  # G head
    (32, 16, 3, 2, 0, 0, 3),  # CAE dec 1
    (16, 8, 3, 2, 1, 1, 7),  # CAE dec 2 (output_padding)
    (8, 1, 3, 2, 1, 1, 14),  # CAE dec 3
    # adversarial
    (3, 5, 2, 3, 0, 2, 4),  # stride > kernel (empty residue streams)
    (4, 6, 5, 2, 3, 1, 6),  # padding > kernel//2
    (2, 3, 3, 3, 0, 2, 1),  # 1x1 input with stride>1 (einsum wins dispatch)
    (2, 3, 4, 2, 1, 0, 5),  # odd input size
    (7, 2, 1, 2, 0, 1, 3),  # k=1 with stride 2
]


@pytest.mark.parametrize("cin,cout,k,s,p,op,hw", CONVT_SHAPES)
def test_convt_lowerings_match_torch(cin, cout, k, s, p, op, hw):
    x = _rand(2, cin, hw, hw, seed=11)
    w = _rand(cin, cout, k, k, seed=12) * 0.1
    b = _rand(cout, seed=13) * 0.1
    want = F.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b),
        stride=s, padding=p, output_padding=op,
    ).numpy()
    for lowering in ("auto", "dilated", "subpixel", "einsum"):
        if lowering == "einsum" and hw != 1:
            continue
        if lowering == "subpixel" and s == 1:
            continue
        got = np.asarray(conv_transpose2d(
            jnp.array(x), jnp.array(w), jnp.array(b),
            stride=s, padding=p, output_padding=op, lowering=lowering,
        ))
        assert got.shape == want.shape, lowering
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL,
                                   err_msg=lowering)


@pytest.mark.parametrize("cin,cout,k,s,p,op,hw", CONVT_SHAPES)
def test_convt_lowering_gradients_match(cin, cout, k, s, p, op, hw):
    x = jnp.array(_rand(2, cin, hw, hw, seed=21))
    w = jnp.array(_rand(cin, cout, k, k, seed=22) * 0.1)
    cot = jnp.array(_rand(
        2, cout, (hw - 1) * s - 2 * p + k + op, (hw - 1) * s - 2 * p + k + op,
        seed=23))

    def loss(lowering):
        return lambda xx, ww: jnp.sum(
            conv_transpose2d(xx, ww, stride=s, padding=p, output_padding=op,
                             lowering=lowering) * cot)

    gx_ref, gw_ref = jax.grad(loss("dilated"), argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss("auto"), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=GRTOL, atol=GATOL)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=GRTOL, atol=GATOL)


CONV_SHAPES = [
    # (cin, cout, k, s, p, hw) — s2d candidates (small contraction, strided)
    (1, 64, 7, 2, 3, 28),  # ResNet stem on MNIST (the 5 TF/s offender)
    (1, 64, 4, 2, 1, 28),  # DCGAN D / inverter E first conv
    (3, 64, 7, 2, 3, 64),  # RGB stem
    (1, 16, 3, 2, 1, 14),  # CAE-ish
    (2, 4, 3, 3, 2, 9),  # stride 3, pad 2 (off_h > 0)
    (1, 2, 2, 4, 3, 8),  # stride > kernel
    (1, 8, 5, 2, 0, 10),  # no padding
]


@pytest.mark.parametrize("cin,cout,k,s,p,hw", CONV_SHAPES)
def test_conv2d_s2d_matches_torch(cin, cout, k, s, p, hw):
    x = _rand(2, cin, hw, hw, seed=31)
    w = _rand(cout, cin, k, k, seed=32) * 0.1
    b = _rand(cout, seed=33) * 0.1
    want = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                    stride=s, padding=p).numpy()
    for lowering in ("s2d", "auto", "direct"):
        got = np.asarray(conv2d(jnp.array(x), jnp.array(w), jnp.array(b),
                                stride=s, padding=p, lowering=lowering))
        assert got.shape == want.shape, lowering
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL,
                                   err_msg=lowering)


@pytest.mark.parametrize("cin,cout,k,s,p,hw", CONV_SHAPES)
def test_conv2d_s2d_gradients_match(cin, cout, k, s, p, hw):
    x = jnp.array(_rand(2, cin, hw, hw, seed=41))
    w = jnp.array(_rand(cout, cin, k, k, seed=42) * 0.1)
    out_hw = (hw + 2 * p - k) // s + 1
    cot = jnp.array(_rand(2, cout, out_hw, out_hw, seed=43))

    def loss(lowering):
        return lambda xx, ww: jnp.sum(
            conv2d(xx, ww, stride=s, padding=p, lowering=lowering) * cot)

    gx_ref, gw_ref = jax.grad(loss("direct"), argnums=(0, 1))(x, w)
    gx, gw = jax.grad(loss("s2d"), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=GRTOL, atol=GATOL)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=GRTOL, atol=GATOL)


def test_convt_einsum_rejects_spatial_input():
    """Forcing lowering='einsum' on a >1x1 input must raise, not silently
    compute from x[:, :, 0, 0] (which would drop all other pixels)."""
    x = jnp.array(_rand(1, 3, 7, 7, seed=61))
    w = jnp.array(_rand(3, 4, 4, 4, seed=62))
    with pytest.raises(ValueError, match="1x1-spatial"):
        conv_transpose2d(x, w, stride=2, padding=1, lowering="einsum")
    # einsum1x1 applies einsum only where valid → correct on spatial inputs
    want = F.conv_transpose2d(torch.tensor(np.asarray(x)),
                              torch.tensor(np.asarray(w)),
                              stride=2, padding=1).numpy()
    got = np.asarray(conv_transpose2d(x, w, stride=2, padding=1,
                                      lowering="einsum1x1"))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_conv2d_auto_skips_unaligned_and_large_contraction():
    # odd H with stride 2 → auto must fall back to direct (and still be right)
    x = _rand(2, 1, 15, 15, seed=51)
    w = _rand(4, 1, 3, 3, seed=52)
    want = F.conv2d(torch.tensor(x), torch.tensor(w), stride=2, padding=1).numpy()
    got = np.asarray(conv2d(jnp.array(x), jnp.array(w), stride=2, padding=1,
                            lowering="auto"))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)
    # big contraction (64*9 > 128) → direct path regardless
    x2 = _rand(1, 64, 8, 8, seed=53)
    w2 = _rand(8, 64, 3, 3, seed=54) * 0.1
    want2 = F.conv2d(torch.tensor(x2), torch.tensor(w2), stride=2, padding=1).numpy()
    got2 = np.asarray(conv2d(jnp.array(x2), jnp.array(w2), stride=2, padding=1,
                             lowering="auto"))
    np.testing.assert_allclose(got2, want2, rtol=RTOL, atol=ATOL)

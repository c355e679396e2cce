"""Golden fp32 parity tests of ops/ against torch CPU.

Torch is the oracle here (the reference is a torch codebase); no reference
code is imported or copied — only op-level numerics are compared.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.ops import (
    adaptive_max_pool2d,
    adjust_dynamic_range,
    batch_norm_eval,
    batch_norm_train,
    BatchNormStats,
    conv2d,
    conv_transpose2d,
    max_pool2d,
    rescale01_per_sample,
)

RTOL, ATOL = 1e-5, 1e-5


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize(
    "cin,cout,k,s,p,hw",
    [
        (1, 64, 4, 2, 1, 28),  # DCGAN D first conv (util_dcgan.py:110)
        (128, 1, 7, 2, 0, 7),  # DCGAN D head (util_dcgan.py:113)
        (3, 64, 7, 2, 3, 64),  # ResNet stem (util_cnn.py:85)
        (8, 16, 3, 2, 1, 14),  # CAE encoder (util_cae.py:111)
        (16, 32, 3, 2, 0, 7),  # CAE encoder no-pad (util_cae.py:114)
    ],
)
def test_conv2d_matches_torch(cin, cout, k, s, p, hw):
    x = _rand(2, cin, hw, hw, seed=1)
    w = _rand(cout, cin, k, k, seed=2) * 0.1
    b = _rand(cout, seed=3) * 0.1
    want = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=s, padding=p).numpy()
    got = np.asarray(conv2d(jnp.array(x), jnp.array(w), jnp.array(b), stride=s, padding=p))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize(
    "cin,cout,k,s,p,op,hw",
    [
        (100, 128, 7, 1, 0, 0, 1),  # G block 1: 1->7 (util_dcgan.py:135)
        (128, 64, 4, 2, 1, 0, 7),  # G block 2: 7->14 (util_dcgan.py:136)
        (64, 1, 4, 2, 1, 0, 14),  # G head: 14->28 (util_dcgan.py:137)
        (32, 16, 3, 2, 0, 0, 3),  # CAE dec 1 (util_cae.py:151)
        (16, 8, 3, 2, 1, 1, 7),  # CAE dec 2 w/ output_padding (util_cae.py:154)
        (8, 1, 3, 2, 1, 1, 14),  # CAE dec 3 (util_cae.py:157)
    ],
)
def test_conv_transpose2d_matches_torch(cin, cout, k, s, p, op, hw):
    x = _rand(2, cin, hw, hw, seed=4)
    w = _rand(cin, cout, k, k, seed=5) * 0.1
    b = _rand(cout, seed=6) * 0.1
    want = F.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=s, padding=p, output_padding=op
    ).numpy()
    got = np.asarray(
        conv_transpose2d(jnp.array(x), jnp.array(w), jnp.array(b), stride=s, padding=p, output_padding=op)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_batch_norm_train_matches_torch():
    x = _rand(8, 16, 7, 7, seed=7)
    scale = _rand(16, seed=8) * 0.1 + 1.0
    bias = _rand(16, seed=9) * 0.1
    bn = torch.nn.BatchNorm2d(16)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(scale))
        bn.bias.copy_(torch.tensor(bias))
    bn.train()
    want = bn(torch.tensor(x)).detach().numpy()

    stats = BatchNormStats.init(16)
    got, new_stats = batch_norm_train(jnp.array(x), jnp.array(scale), jnp.array(bias), stats)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    # running stats (torch: momentum 0.1, unbiased var for the update)
    np.testing.assert_allclose(np.asarray(new_stats.mean), bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats.var), bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_batch_norm_train_bf16_inputs_keep_fp32_stats():
    """The bf16 mixed-precision train path feeds BN bf16 activations; the
    batch statistics must still be computed in fp32 (bf16 mean/var reductions
    corrupt the running stats), the running-stat pytree must stay fp32, and
    the normalized output comes back in the input dtype."""
    x = _rand(16, 8, 7, 7, seed=21)
    scale = _rand(8, seed=22) * 0.1 + 1.0
    bias = _rand(8, seed=23) * 0.1
    stats = BatchNormStats.init(8)

    y32, st32 = batch_norm_train(jnp.array(x), jnp.array(scale), jnp.array(bias), stats)
    y16, st16 = batch_norm_train(
        jnp.array(x, jnp.bfloat16),
        jnp.array(scale, jnp.bfloat16),
        jnp.array(bias, jnp.bfloat16),
        stats,
    )
    assert y16.dtype == jnp.bfloat16
    assert st16.mean.dtype == jnp.float32 and st16.var.dtype == jnp.float32
    # stats computed from bf16-rounded inputs but in fp32 arithmetic: the
    # only error left is the input rounding (~4e-3 relative), far below what
    # bf16-accumulated reductions over 784 elements would produce
    np.testing.assert_allclose(np.asarray(st16.mean), np.asarray(st32.mean),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(st16.var), np.asarray(st32.var),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               rtol=0.1, atol=0.05)


def test_batch_norm_eval_matches_torch():
    x = _rand(4, 8, 5, 5, seed=10)
    scale = np.ones(8, np.float32)
    bias = np.zeros(8, np.float32)
    rm = _rand(8, seed=11) * 0.2
    rv = np.abs(_rand(8, seed=12)) + 0.5
    bn = torch.nn.BatchNorm2d(8)
    with torch.no_grad():
        bn.running_mean.copy_(torch.tensor(rm))
        bn.running_var.copy_(torch.tensor(rv))
    bn.eval()
    want = bn(torch.tensor(x)).detach().numpy()
    got = batch_norm_eval(
        jnp.array(x), jnp.array(scale), jnp.array(bias), BatchNormStats(jnp.array(rm), jnp.array(rv))
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,s,p,hw", [
    (3, 2, 1, 14), (2, 2, 0, 28), (3, 2, 1, 7),
    # odd size on the reshape-max path (k==s, p=0): floor mode drops the
    # ragged tail row/col, exactly torch ceil_mode=False
    (2, 2, 0, 7), (3, 3, 0, 14),
])
def test_max_pool2d_matches_torch(k, s, p, hw):
    x = _rand(2, 4, hw, hw, seed=13)
    want = F.max_pool2d(torch.tensor(x), k, s, p).numpy()
    got = np.asarray(max_pool2d(jnp.array(x), k, s, p))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("k,hw", [(2, 28), (2, 7), (3, 14)])
def test_max_pool2d_grad_matches_torch_on_ties(k, hw):
    """The reshape-max fast path's VJP must use torch's first-max-wins tie
    rule, not even splitting: flat regions (constant backgrounds) produce
    exactly-tied windows, and assessor-training gradient parity depends on
    routing the whole cotangent to one element per window."""
    x = _rand(2, 3, hw, hw, seed=15)
    # force ties: quantize hard, and make one full window constant
    x = np.round(x * 2.0) / 2.0
    x[0, 0, :k, :k] = 0.5

    xt = torch.tensor(x, requires_grad=True)
    F.max_pool2d(xt, k, k, 0).sum().backward()
    want = xt.grad.numpy()

    got = np.asarray(
        jax.grad(lambda a: max_pool2d(a, k).sum())(jnp.array(x))
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_adaptive_max_pool2d_matches_torch():
    x = _rand(2, 6, 7, 7, seed=14)
    want = torch.nn.AdaptiveMaxPool2d((1, 1))(torch.tensor(x)).numpy()
    got = np.asarray(adaptive_max_pool2d(jnp.array(x), (1, 1)))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    want2 = torch.nn.AdaptiveMaxPool2d((3, 3))(torch.tensor(x)).numpy()
    got2 = np.asarray(adaptive_max_pool2d(jnp.array(x), (3, 3)))
    np.testing.assert_allclose(got2, want2, rtol=0, atol=0)


def test_rescale01_per_sample_matches_per_image_loop():
    imgs = _rand(5, 1, 28, 28, seed=15) * 3.0 + 1.0
    got = np.asarray(rescale01_per_sample(jnp.array(imgs)))
    for i in range(5):
        mn, mx = imgs[i].min(), imgs[i].max()
        np.testing.assert_allclose(got[i], (imgs[i] - mn) / (mx - mn), rtol=1e-6, atol=1e-6)
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_adjust_dynamic_range():
    x = np.linspace(0, 1, 11, dtype=np.float32)
    y = np.asarray(adjust_dynamic_range(jnp.array(x), (0, 1), (-1, 1)))
    np.testing.assert_allclose(y, x * 2 - 1, rtol=1e-6)
    # identity when ranges equal
    z = np.asarray(adjust_dynamic_range(jnp.array(x), (0, 1), (0, 1)))
    np.testing.assert_array_equal(z, x)

"""Functional layer constructors: params are plain pytrees, application is
pure. Initializers reproduce torch's defaults plus the reference's explicit
schemes (DCGAN N(0, 0.02), reference src/utils/util_dcgan.py:45-48;
glorot/he/normal for the CNNs, src/pso/util_cnn.py:65-79; xavier_uniform for
VQ-VAE, src/inverter/utils_vq_vae/util_model.py:39-46) so parameter scales —
and therefore training dynamics — match the reference at fp32.

Layout conventions match torch so parity tests can inject torch state dicts:
conv weight (O, I, kH, kW); conv-transpose weight (I, O, kH, kW); linear
weight (out, in).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.ops import BatchNormStats


# -- initializers (torch-equivalent) ----------------------------------------


def kaiming_uniform(key, shape, fan_in, a=math.sqrt(5.0)):
    """torch's default conv/linear weight init: U(-b, b),
    b = gain·sqrt(3/fan_in), gain = sqrt(2/(1+a²))."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def uniform_fan_in(key, shape, fan_in):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def normal_002(key, shape):
    """DCGAN paper init N(0, 0.02) (reference util_dcgan.py:45-48)."""
    return 0.02 * jax.random.normal(key, shape, jnp.float32)


def xavier_uniform(key, shape, fan_in, fan_out):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def xavier_normal(key, shape, fan_in, fan_out):
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, jnp.float32)


def he_normal(key, shape, fan_in, a=0.0):
    """kaiming_normal_(mode='fan_in', nonlinearity='leaky_relu') — the
    reference's 'he_normal' option (util_cnn.py:69)."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    return (gain / math.sqrt(fan_in)) * jax.random.normal(key, shape, jnp.float32)


_WEIGHT_INITS = {
    "torch_default": None,  # handled per-layer with kaiming_uniform
    "random_normal": lambda key, shape, fi, fo: normal_002(key, shape),
    "glorot_normal": lambda key, shape, fi, fo: xavier_normal(key, shape, fi, fo),
    "glorot_uniform": lambda key, shape, fi, fo: xavier_uniform(key, shape, fi, fo),
    "he_normal": lambda key, shape, fi, fo: he_normal(key, shape, fi),
}


# -- layer param constructors ------------------------------------------------


def conv_params(key, cin, cout, k, bias=True, init="torch_default"):
    """Conv2d params: weight (O,I,kH,kW) [+ bias (O,)]."""
    kh, kw = (k, k) if isinstance(k, int) else k
    fan_in = cin * kh * kw
    fan_out = cout * kh * kw
    wkey, bkey = jax.random.split(key)
    shape = (cout, cin, kh, kw)
    if init == "torch_default":
        w = kaiming_uniform(wkey, shape, fan_in)
    else:
        w = _WEIGHT_INITS[init](wkey, shape, fan_in, fan_out)
    p = {"w": w}
    if bias:
        p["b"] = uniform_fan_in(bkey, (cout,), fan_in)
    return p


def conv_transpose_params(key, cin, cout, k, bias=True, init="torch_default"):
    """ConvTranspose2d params: weight (I,O,kH,kW) [+ bias (O,)].

    torch computes fan_in for this layout from dim 1 → cout·kH·kW."""
    kh, kw = (k, k) if isinstance(k, int) else k
    fan_in = cout * kh * kw
    fan_out = cin * kh * kw
    wkey, bkey = jax.random.split(key)
    shape = (cin, cout, kh, kw)
    if init == "torch_default":
        w = kaiming_uniform(wkey, shape, fan_in)
    else:
        w = _WEIGHT_INITS[init](wkey, shape, fan_in, fan_out)
    p = {"w": w}
    if bias:
        p["b"] = uniform_fan_in(bkey, (cout,), fan_in)
    return p


def linear_params(key, cin, cout, bias=True, init="torch_default"):
    """Linear params: weight (out, in) [+ bias (out,)]."""
    wkey, bkey = jax.random.split(key)
    if init == "torch_default":
        w = kaiming_uniform(wkey, (cout, cin), cin)
    else:
        w = _WEIGHT_INITS[init](wkey, (cout, cin), cin, cout)
    p = {"w": w}
    if bias:
        p["b"] = uniform_fan_in(bkey, (cout,), cin)
    return p


def bn_params(channels, init="torch_default", key=None):
    """BatchNorm2d affine params. torch default: weight=1, bias=0. The DCGAN
    scheme re-draws the BN weight from N(0,0.02) (util_dcgan.py:45-48)."""
    if init == "random_normal":
        return {"scale": normal_002(key, (channels,)), "bias": jnp.zeros((channels,))}
    return {"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,))}


def bn_state(channels):
    return BatchNormStats.init(channels)


# -- functional applications -------------------------------------------------


def linear(p, x, *, precision=None):
    # consult the precision policy at TRACE time like ops/conv.py does, so
    # fast_math() relaxes fully-connected matmuls too (a baked-in HIGHEST
    # default kept fc layers at multi-pass f32 emulation on the fast path)
    if precision is None:
        from gan_discovery_pso_tpu.ops.precision import default_precision

        precision = default_precision()
    y = jnp.matmul(x, p["w"].T, precision=precision)
    if "b" in p:
        y = y + p["b"]
    return y


def leaky_relu(x, alpha=0.2):
    return jax.nn.leaky_relu(x, alpha)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))

"""Shared training utilities: optimizer factory, losses, label smoothing.

Mirrors the reference's optimizer knobs (get_opti,
reference src/utils/util_dcgan.py:36-42 / src/pso/util_cnn.py:56-62) on
optax, and the GAN label-smoothing scheme (util_dcgan.py:77-83).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gan_discovery_pso_tpu.core.config import AdamConfig


def make_optimizer(cfg: AdamConfig, name: str | None = None) -> optax.GradientTransformation:
    """Adam/RMSprop with the reference's hyper-parameter names. weight_decay
    is torch-style L2-into-gradient (additive), matching optim.Adam.
    The optimizer kind comes from the config block's `name` (a YAML
    `name: RMSprop` used to be validated and then silently ignored)."""
    if name is None:
        name = getattr(cfg, "name", "Adam")
    if name == "Adam":
        tx = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.epsilon)
    elif name == "RMSprop":
        # torch-parity: optim.RMSprop defaults alpha=0.99 (optax.rmsprop's
        # decay default is 0.9) and applies eps OUTSIDE the sqrt —
        # g / (sqrt(v) + eps) — which is eps_in_sqrt=False
        # (reference get_opti passes only lr/eps/weight_decay,
        # util_dcgan.py:36-42, so torch defaults govern the rest)
        tx = optax.chain(
            optax.scale_by_rms(decay=0.99, eps=cfg.epsilon, eps_in_sqrt=False),
            optax.scale(-cfg.lr),
        )
    else:
        raise ValueError(name)
    if cfg.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx


def bce_from_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy, numerically stable (== torch BCELoss on
    sigmoid(logits))."""
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, targets))


def bce_on_probs(probs: jax.Array, targets: jax.Array, eps: float = 1e-12) -> jax.Array:
    """BCE directly on probabilities (for paths that already applied a
    sigmoid). torch BCELoss clamps log terms at -100; the eps clip here is
    equivalent protection."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))


def smooth_positive(key, shape):
    """class=1 → U[0.7, 1.2] (reference util_dcgan.py:77-81)."""
    return 0.7 + 0.5 * jax.random.uniform(key, shape, jnp.float32)


def smooth_negative(key, shape):
    """class=0 → U[0.0, 0.3] (reference util_dcgan.py:77-83)."""
    return 0.3 * jax.random.uniform(key, shape, jnp.float32)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy on int labels (torch CrossEntropyLoss)."""
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels.astype(jnp.int32))
    )

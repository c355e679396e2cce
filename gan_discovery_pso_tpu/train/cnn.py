"""Assessor CNN training: binary one-vs-all and multi-class variants.

Reproduces the reference training loops (src/pso/util_cnn.py:277-493) as
jitted train/eval steps + a host epoch driver:

- binary mode: labels binarized `y == label` (:309-311);
- multipatient mode: labels remapped through class_to_idx (:420);
- loss = softmax cross-entropy (torch CrossEntropyLoss on 2 or C logits);
- ReduceLROnPlateau on the val loss (patience from config, factor 0.1,
  reference configs/dcgan_mnist.yaml:133-135) and early stopping on
  epochs-without-val-improvement (:357-369);
- best weights restored at the end, saved as model[_label] (:377-383).

Epoch metrics (acc/F1/precision/recall) accumulate ON DEVICE from batch
confusion counts — no per-batch sklearn host calls. The reference averages
per-batch F1/prec/rec (:328-337); we compute them from epoch-level counts
(the statistically sound version; values coincide as batch count grows).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gan_discovery_pso_tpu.core.config import AdamConfig
from gan_discovery_pso_tpu.models.resnet import ResNetDef, resnet_apply, resnet_init
from gan_discovery_pso_tpu.train.common import cross_entropy_loss, make_optimizer


class CnnTrainState(NamedTuple):
    params: dict
    model_state: dict
    opt_state: optax.OptState
    lr_scale: jax.Array  # ReduceLROnPlateau multiplier
    step: jax.Array


class EpochCounts(NamedTuple):
    """Device-side confusion accumulators (per class, one-vs-rest)."""

    loss_sum: jax.Array
    n: jax.Array
    correct: jax.Array
    tp: jax.Array  # [C]
    fp: jax.Array  # [C]
    fn: jax.Array  # [C]

    @classmethod
    def zero(cls, n_class: int):
        z = jnp.zeros((), jnp.float32)
        zc = jnp.zeros((n_class,), jnp.float32)
        return cls(z, z, z, zc, zc, zc)


def _update_counts(counts: EpochCounts, loss, logits, labels) -> EpochCounts:
    preds = jnp.argmax(logits, axis=1)
    n_class = logits.shape[1]
    onehot_p = jax.nn.one_hot(preds, n_class)
    onehot_y = jax.nn.one_hot(labels, n_class)
    bs = jnp.asarray(labels.shape[0], jnp.float32)
    return EpochCounts(
        loss_sum=counts.loss_sum + loss * bs,
        n=counts.n + bs,
        correct=counts.correct + jnp.sum(preds == labels),
        tp=counts.tp + jnp.sum(onehot_p * onehot_y, axis=0),
        fp=counts.fp + jnp.sum(onehot_p * (1 - onehot_y), axis=0),
        fn=counts.fn + jnp.sum((1 - onehot_p) * onehot_y, axis=0),
    )


def counts_to_metrics(counts: EpochCounts, average: str) -> dict:
    """'binary' → positive-class P/R/F1 (sklearn f1_score default);
    'macro' → unweighted class mean (the multipatient loop's average,
    reference util_cnn.py:437-439)."""
    tp, fp, fn = np.asarray(counts.tp), np.asarray(counts.fp), np.asarray(counts.fn)
    with np.errstate(divide="ignore", invalid="ignore"):
        prec = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
        rec = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        f1 = np.where(prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0)
    if average == "binary":
        prec, rec, f1 = prec[1], rec[1], f1[1]
    else:
        prec, rec, f1 = prec.mean(), rec.mean(), f1.mean()
    return {
        "loss": float(counts.loss_sum / counts.n),
        "acc": float(counts.correct / counts.n),
        "f1": float(f1),
        "prec": float(prec),
        "rec": float(rec),
    }


def make_cnn_steps(rdef, adam: AdamConfig, apply_fn=None):
    """(train_step, eval_step) jitted closures. Labels arrive already mapped
    (binarized or class_to_idx-remapped by the caller).

    apply_fn(params, model_state, x, mdef, train) defaults to the ResNet
    assessor; pass models.alexnet_apply (with an AlexNetDef as `rdef`) for
    the AlexNet battery (reference get_cnn factory, util_cnn.py:24-38)."""
    if apply_fn is None:
        apply_fn = resnet_apply
    tx = make_optimizer(adam)

    @jax.jit
    def train_step(state: CnnTrainState, x, y, counts: EpochCounts):
        def loss_fn(p):
            logits, new_ms = apply_fn(p, state.model_state, x, rdef, train=True)
            return cross_entropy_loss(logits, y), (logits, new_ms)

        (loss, (logits, new_ms)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # ReduceLROnPlateau: scale the update (optax.adam emits -lr·m̂/√v̂)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = CnnTrainState(new_params, new_ms, new_opt, state.lr_scale, state.step + 1)
        return new_state, _update_counts(counts, loss, logits, y)

    @jax.jit
    def eval_step(state: CnnTrainState, x, y, counts: EpochCounts):
        logits, _ = apply_fn(state.params, state.model_state, x, rdef, train=False)
        loss = cross_entropy_loss(logits, y)
        return _update_counts(counts, loss, logits, y)

    return train_step, eval_step


def train_cnn(
    key,
    rdef: ResNetDef,
    adam: AdamConfig,
    train_batches: Callable[[int], "iter"],
    val_batches: Callable[[int], "iter"],
    num_epochs: int,
    early_stopping: int = 20,
    scheduler_patience: int = 10000,
    label=None,
    init: str = "glorot_normal",
    init_state: CnnTrainState | None = None,
    metrics_writer=None,
    average: str | None = None,
    apply_fn=None,
    init_fn=None,
):
    """Epoch driver. `label` switches binary mode: y ← (y == label)
    (reference util_cnn.py:309-311); otherwise labels are remapped through
    rdef.class_to_idx (train_model_multipatient, :420).

    train_batches/val_batches: epoch_idx -> iterator of (x, y) device
    batches (see data.epoch_batches).

    Returns (state, history dict-of-lists, best_epoch).
    """
    if average is None:
        average = "binary" if label is not None else "macro"
    if init_state is None:
        tx = make_optimizer(adam)

        # one fused init+opt-state program instead of ~800 per-tensor
        # dispatches (minutes over the TPU tunnel for a full-width ResNet)
        @jax.jit
        def _build(k):
            params, model_state = (init_fn or resnet_init)(k, rdef, init=init)
            return params, model_state, tx.init(params)

        params, model_state, opt0 = _build(key)
        init_state = CnnTrainState(
            params, model_state, opt0, jnp.asarray(1.0, jnp.float32),
            jnp.asarray(0, jnp.int32),
        )
    state = init_state
    train_step, eval_step = make_cnn_steps(rdef, adam, apply_fn=apply_fn)

    c2i = rdef.class_to_idx()
    if label is None and not c2i:
        # an empty map would silently send every label through jnp.take's
        # out-of-bounds fill (NaN-poisoned metrics, no error)
        raise ValueError(
            "multipatient mode (label=None) needs rdef.iid_classes to map "
            "dataset labels to logit columns — it is empty"
        )
    lut = np.zeros(max(max(c2i, default=0) + 1, 1), np.int32)
    for c, i in c2i.items():
        lut[c] = i
    lut = jnp.asarray(lut)

    def map_labels(y):
        if label is not None:
            return (y == label).astype(jnp.int32)
        return jnp.take(lut, y)

    history = {k: [] for k in (
        "train_loss", "val_loss", "train_acc", "val_acc", "train_f1", "val_f1",
        "train_prec", "val_prec", "train_rec", "val_rec")}
    best_loss, best_epoch, best_params = np.inf, num_epochs, state.params
    best_model_state = state.model_state
    epochs_no_improve, plateau_count = 0, 0

    for epoch in range(num_epochs):
        counts = EpochCounts.zero(rdef.n_class)
        for x, y in train_batches(epoch):
            state, counts = train_step(state, x, map_labels(y), counts)
        m_tr = counts_to_metrics(counts, average)

        counts = EpochCounts.zero(rdef.n_class)
        for x, y in val_batches(epoch):
            counts = eval_step(state, x, map_labels(y), counts)
        m_va = counts_to_metrics(counts, average)

        for k, m in (("train", m_tr), ("val", m_va)):
            for mk in ("loss", "acc", "f1", "prec", "rec"):
                history[f"{k}_{mk}"].append(m[mk])
        if metrics_writer is not None:
            metrics_writer.append(epoch, **{f"train_{k}": v for k, v in m_tr.items()},
                                  **{f"val_{k}": v for k, v in m_va.items()})

        # scheduler: val-loss plateau → lr × 0.1 (torch ReduceLROnPlateau)
        if m_va["loss"] < best_loss - 1e-12:
            plateau_count = 0
        else:
            plateau_count += 1
            if plateau_count > scheduler_patience:
                state = state._replace(lr_scale=state.lr_scale * 0.1)
                plateau_count = 0

        # early stopping + best tracking (reference :357-369)
        if m_va["loss"] < best_loss:
            best_loss, best_epoch = m_va["loss"], epoch
            best_params, best_model_state = state.params, state.model_state
            epochs_no_improve = 0
        else:
            epochs_no_improve += 1
            if epochs_no_improve >= early_stopping:
                break

    state = state._replace(params=best_params, model_state=best_model_state)
    return state, history, best_epoch

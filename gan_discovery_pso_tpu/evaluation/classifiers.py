"""The KNN classifier battery — the framework's "Inception" posterior.

The reference fits one sklearn KNeighborsClassifier(n_neighbors=5) per IiD
class on CAE embeddings (train = first 80% of rows; the battery every eval
epoch consumes is trained at reference src/training/classifiers.py:184 —
the k=3 in src/evaluation/util_classifiers.py:30 is dead code, never
called) and queries it predict_proba PER IMAGE PER CLASS
(util_classifiers.py:35-55). KNN has no fit step — the "battery" is just
(embeddings, labels, class list) — so here it is a small pytree and the
posterior for ALL images × ALL classes is one device program (ops/knn.py).
Parity vs sklearn is golden-tested at k=5.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gan_discovery_pso_tpu.core.checkpoint import load_pytree, save_pytree
from gan_discovery_pso_tpu.ops.knn import knn_battery_posterior


class KnnBattery(NamedTuple):
    train_x: jax.Array  # [M, D] embeddings
    train_labels: jax.Array  # [M] int labels
    classes: jax.Array  # [C] the battery's class list (sorted unique)
    k: int = 5


def train_classifier_battery(
    encoded_train: np.ndarray, labels: np.ndarray, k: int = 5, val_fraction: float = 0.2
) -> KnnBattery:
    """Build the battery with the reference's 80/20 head/tail split
    (src/training/classifiers.py:174-184: fit on rows[:-val_size],
    n_neighbors=5)."""
    n = len(encoded_train)
    val_size = int(n * val_fraction)
    cut = n - val_size if val_size > 0 else n
    x = jnp.asarray(encoded_train[:cut], jnp.float32)
    y = jnp.asarray(labels[:cut], jnp.int32)
    classes = jnp.asarray(np.unique(np.asarray(labels)), jnp.int32)
    return KnnBattery(train_x=x, train_labels=y, classes=classes, k=k)


def compute_posterior(
    battery: KnnBattery, encoding: jax.Array, chunk_size: int | str = "auto"
) -> jax.Array:
    """p_yx [N, C] — column c = P(class_c | image) from the one-vs-all KNN
    (util_classifiers.py:35-55), all classifiers sharing one distance
    matrix. chunk_size='auto' keeps the fast single-matrix path until the
    [Nq, Ntrain] distance matrix would exceed ~512 MB, then switches to
    query chunking (bit-identical results, bounded HBM)."""
    encoding = jnp.asarray(encoding, jnp.float32)
    if chunk_size == "auto":
        n_train = max(int(battery.train_x.shape[0]), 1)
        entries = encoding.shape[0] * n_train
        if entries > 128_000_000:
            # derive from Ntrain so each chunk's matrix stays ≤ ~512 MB
            # regardless of the training-set size
            chunk_size = max(128, 128_000_000 // n_train)
        else:
            chunk_size = None
    return knn_battery_posterior(
        encoding,
        battery.train_x,
        battery.train_labels,
        battery.classes,
        k=battery.k,
        chunk_size=chunk_size,
    )


def assign_labels(battery: KnnBattery, encoding: jax.Array):
    """(p_yx, argmax COLUMN indices) — the `assign_label` branch
    (util_classifiers.py:45-53; softmax then argmax ≡ argmax). The
    reference returns column indices, not class values (they differ for
    non-contiguous iid class lists); map through `battery.classes` when
    the actual label is wanted: `battery.classes[idx]`."""
    p_yx = compute_posterior(battery, encoding)
    return p_yx, jnp.argmax(p_yx, axis=1)


def error_reject_points(
    y_valid: np.ndarray,
    proba: np.ndarray,
    thresholds: np.ndarray | None = None,
    t_bin: float = 0.5,
):
    """The reference's reliability-threshold error/reject sweep
    (src/training/classifiers.py:186-213), for ONE one-vs-all classifier.

    y_valid: [V] binary ground truth (label == class).
    proba:   [V] P(y=1 | x) from that classifier.

    reliability = |1 − proba / t_bin|; for each of the 90 thresholds the
    mask keeps reliable predictions, %rejected = |kept − V| / V · 100, and
    %error = (1 − accuracy on the kept subset) · 100. Returns
    (p_rej[%], p_error[%], thresholds). Empty kept subsets (possible when
    every prediction is unreliable) record 0 error, where sklearn's
    accuracy_score would raise — the reference never hits that case because
    KNN probabilities at p∈{0,1} are always maximally reliable.
    """
    y_valid = np.asarray(y_valid).astype(int)
    proba = np.asarray(proba, np.float64)
    if thresholds is None:
        thresholds = np.linspace(0.0, 0.9, num=90)
    # KNeighborsClassifier.predict: majority vote == proba > 0.5 (at an even-k
    # tie sklearn's argmax breaks toward class 0, which > also produces).
    pred_bin = (proba > t_bin).astype(int)
    reliability = np.abs(1.0 - proba / t_bin)
    v = len(y_valid)
    p_rej, p_err = [], []
    for ths in thresholds:
        mask = reliability > ths
        kept = int(mask.sum())
        p_rej.append(abs(kept - v) / v * 100.0)
        if kept == 0:
            p_err.append(0.0)
        else:
            acc = float((y_valid[mask] == pred_bin[mask]).mean())
            p_err.append((1.0 - acc) * 100.0)
    return np.asarray(p_rej), np.asarray(p_err), np.asarray(thresholds)


def save_battery(path, battery: KnnBattery):
    """Persist as a pytree (replaces the reference's pickled sklearn dict,
    util_classifiers.py:10-13)."""
    save_pytree(path, {"train_x": battery.train_x, "train_labels": battery.train_labels,
                       "classes": battery.classes, "k": battery.k})


def load_battery(path) -> KnnBattery:
    d = load_pytree(path)
    return KnnBattery(
        train_x=jnp.asarray(d["train_x"]),
        train_labels=jnp.asarray(d["train_labels"]),
        classes=jnp.asarray(d["classes"]),
        k=int(d["k"]),
    )

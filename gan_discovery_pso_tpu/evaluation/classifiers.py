"""The KNN classifier battery — the framework's "Inception" posterior.

The reference fits one sklearn KNeighborsClassifier(n_neighbors=3) per IiD
class on CAE embeddings (train = first 80% of rows,
reference src/evaluation/util_classifiers.py:16-33) and queries it
predict_proba PER IMAGE PER CLASS (:35-55). KNN has no fit step — the
"battery" is just (embeddings, labels, class list) — so here it is a small
pytree and the posterior for ALL images × ALL classes is one device program
(ops/knn.py). Parity vs sklearn is golden-tested.
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
    k: int = 3


def train_classifier_battery(
    encoded_train: np.ndarray, labels: np.ndarray, k: int = 3, val_fraction: float = 0.2
) -> KnnBattery:
    """Build the battery with the reference's 80/20 head/tail split
    (util_classifiers.py:19-28: fit on rows[:-val_size])."""
    n = len(encoded_train)
    val_size = int(n * val_fraction)
    cut = n - val_size if val_size > 0 else n
    x = jnp.asarray(encoded_train[:cut], jnp.float32)
    y = jnp.asarray(labels[:cut], jnp.int32)
    classes = jnp.asarray(np.unique(np.asarray(labels)), jnp.int32)
    return KnnBattery(train_x=x, train_labels=y, classes=classes, k=k)


def compute_posterior(battery: KnnBattery, encoding: jax.Array) -> jax.Array:
    """p_yx [N, C] — column c = P(class_c | image) from the one-vs-all KNN
    (util_classifiers.py:35-55), all classifiers sharing one distance
    matrix."""
    return knn_battery_posterior(
        jnp.asarray(encoding, jnp.float32),
        battery.train_x,
        battery.train_labels,
        battery.classes,
        k=battery.k,
    )


def assign_labels(battery: KnnBattery, encoding: jax.Array):
    """(p_yx, argmax labels) — the `assign_label` branch
    (util_classifiers.py:45-53; softmax then argmax ≡ argmax)."""
    p_yx = compute_posterior(battery, encoding)
    return p_yx, jnp.take(battery.classes, jnp.argmax(p_yx, axis=1))


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

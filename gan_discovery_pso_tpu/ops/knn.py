"""Vectorized K-nearest-neighbour posterior on device.

The reference's "Inception" classifier battery is a dict of sklearn
`KNeighborsClassifier(n_neighbors=5)` fitted per IiD class on CAE
embeddings (reference src/training/classifiers.py:166-184 — the battery
the dcgan eval actually loads; util_classifiers.py:16-33's k=3 trainer is
dead code), queried with one `predict_proba` call PER IMAGE PER CLASS
(src/evaluation/util_classifiers.py:35-55) — O(N·C) python/sklearn calls
per eval epoch. Here the whole battery is one fused device program: a
single pairwise-distance matmul (MXU) + top-k + a one-hot label average,
producing the identical posterior matrix p(y|x) for all images and all
classes at once (golden-tested against sklearn in tests/test_ops_eval.py),
with optional query chunking that bounds the distance matrix's HBM
footprint bit-identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_dists(queries: jax.Array, points: jax.Array) -> jax.Array:
    """Squared Euclidean distances [Nq, Np] via the expanded form (one MXU
    matmul instead of an O(N²·d) broadcast subtract)."""
    q2 = jnp.sum(queries * queries, axis=1, keepdims=True)  # [Nq,1]
    p2 = jnp.sum(points * points, axis=1)[None, :]  # [1,Np]
    cross = jnp.matmul(queries, points.T, precision=jax.lax.Precision.HIGHEST)  # MXU
    return q2 + p2 - 2.0 * cross


def knn_predict_proba(
    queries: jax.Array,
    train_x: jax.Array,
    train_y: jax.Array,
    k: int = 3,
) -> jax.Array:
    """P(y=1 | query) for a binary KNN: fraction of the k nearest train
    points (ties broken by lower index, matching sklearn's ordering) whose
    label is 1. Returns [Nq]."""
    d = pairwise_sq_dists(queries, train_x)
    # top_k on negated distances; top_k breaks ties by lower index — same
    # tie order sklearn produces from its sorted neighbor search.
    _, idx = jax.lax.top_k(-d, k)  # [Nq, k]
    votes = jnp.take(train_y.astype(jnp.float32), idx)  # [Nq, k]
    return jnp.mean(votes, axis=1)


def knn_battery_posterior(
    queries: jax.Array,
    train_x: jax.Array,
    train_labels: jax.Array,
    classes: jax.Array,
    k: int = 5,
    chunk_size: int | None = None,
) -> jax.Array:
    """Posterior matrix p_yx [Nq, n_classes]: column c is the one-vs-all KNN
    probability for class `classes[c]` — the same battery the reference fits
    per class (src/training/classifiers.py:166-184), but sharing ONE
    distance matrix across every classifier since they all use the same
    train embeddings.

    chunk_size bounds HBM: the [Nq, Ntrain] distance matrix is materialized
    one query-chunk at a time via lax.map (e.g. real-MNIST eval is
    12,800 × 48,000 ≈ 2.4 GB unchunked; chunk_size=2048 caps it at ~390 MB)
    with bit-identical results."""
    if chunk_size is None or queries.shape[0] <= chunk_size:
        d = pairwise_sq_dists(queries, train_x)
        _, idx = jax.lax.top_k(-d, k)  # [Nq, k]
        neigh_labels = jnp.take(train_labels, idx)  # [Nq, k]
        # [Nq, k, C] one-hot over battery classes, averaged over k.
        onehot = (neigh_labels[:, :, None] == classes[None, None, :]).astype(jnp.float32)
        return jnp.mean(onehot, axis=1)

    n = queries.shape[0]
    pad = (-n) % chunk_size
    padded = jnp.pad(queries, ((0, pad), (0, 0)))
    chunks = padded.reshape(-1, chunk_size, queries.shape[1])
    out = jax.lax.map(
        lambda q: knn_battery_posterior(q, train_x, train_labels, classes, k=k),
        chunks,
    )
    return out.reshape(-1, classes.shape[0])[:n]

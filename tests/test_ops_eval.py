"""Golden tests for FID sqrtm (vs scipy) and KNN battery (vs sklearn)."""

import numpy as np
import scipy.linalg
from sklearn.neighbors import KNeighborsClassifier

import jax.numpy as jnp

from gan_discovery_pso_tpu.ops import sqrtm_psd, trace_sqrt_product
from gan_discovery_pso_tpu.ops.knn import knn_battery_posterior, knn_predict_proba


def _psd(n, seed):
    rng = np.random.RandomState(seed)
    a = rng.randn(n, n).astype(np.float32)
    return (a @ a.T / n + 0.1 * np.eye(n)).astype(np.float32)


def test_sqrtm_psd_matches_scipy():
    for seed in (0, 1):
        a = _psd(16, seed)
        want = scipy.linalg.sqrtm(a).real
        got = np.asarray(sqrtm_psd(jnp.array(a)))
        # fp32 eigh vs float64 Schur: elementwise agreement to fp32 noise
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-2)
        np.testing.assert_allclose(got @ got, a, rtol=0, atol=2e-2)


def test_trace_sqrt_product_matches_scipy_fid_term():
    """The FID cross-term tr(sqrtm(Σx Σy)) — exactly what the reference
    computes via scipy on host (util_gan_evaluation.py:30-41)."""
    sx, sy = _psd(10, 2), _psd(10, 3)
    want = np.trace(scipy.linalg.sqrtm(sx @ sy).real)
    got = float(trace_sqrt_product(jnp.array(sx), jnp.array(sy)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_knn_predict_proba_matches_sklearn():
    rng = np.random.RandomState(4)
    train_x = rng.randn(200, 10).astype(np.float32)
    train_y = (rng.rand(200) > 0.5).astype(np.uint8)
    queries = rng.randn(37, 10).astype(np.float32)

    clf = KNeighborsClassifier(n_neighbors=3).fit(train_x, train_y)
    want = clf.predict_proba(queries)[:, 1]
    got = np.asarray(knn_predict_proba(jnp.array(queries), jnp.array(train_x), jnp.array(train_y), k=3))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_knn_battery_matches_sklearn_battery():
    """One-vs-all battery posterior == the reference's per-class sklearn loop
    (util_classifiers.py:16-55)."""
    rng = np.random.RandomState(5)
    classes = np.array([0, 2, 3, 4], dtype=np.int32)
    train_x = rng.randn(150, 8).astype(np.float32)
    train_labels = rng.choice(classes, size=150).astype(np.int32)
    queries = rng.randn(23, 8).astype(np.float32)

    want = np.zeros((23, len(classes)))
    for ci, c in enumerate(classes):
        clf = KNeighborsClassifier(n_neighbors=3).fit(train_x, (train_labels == c).astype(np.uint8))
        proba = clf.predict_proba(queries)
        # column for class "1" may be missing if train is single-class
        want[:, ci] = proba[:, 1] if proba.shape[1] == 2 else 0.0

    got = np.asarray(
        knn_battery_posterior(
            jnp.array(queries), jnp.array(train_x), jnp.array(train_labels), jnp.array(classes), k=3
        )
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)

    # query chunking (HBM-bounded eval) is bit-identical, incl. the padded
    # final chunk (23 = 2*8 + 7)
    chunked = np.asarray(
        knn_battery_posterior(
            jnp.array(queries), jnp.array(train_x), jnp.array(train_labels),
            jnp.array(classes), k=3, chunk_size=8,
        )
    )
    np.testing.assert_array_equal(chunked, got)

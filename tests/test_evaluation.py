"""Evaluation-layer golden tests: FID vs scipy formulation, IS vs a numpy
reimplementation, battery posterior vs sklearn, denoise recon smoke."""

import numpy as np
import pytest
import scipy.linalg
from sklearn.neighbors import KNeighborsClassifier

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.evaluation import (
    KnnBattery,
    compute_posterior,
    denoise_recon_loss,
    fid_from_features,
    inception_score,
    load_battery,
    posterior_energy,
    posterior_variance,
    save_battery,
    train_classifier_battery,
)
from gan_discovery_pso_tpu.models.cae import (
    CAEDef,
    cae_decoder_init,
    cae_encoder_init,
)


def test_fid_matches_scipy_formulation():
    rng = np.random.RandomState(0)
    real = rng.randn(300, 10).astype(np.float32)
    syn = (rng.randn(300, 10) * 1.3 + 0.5).astype(np.float32)

    mu_r, mu_s = real.mean(0), syn.mean(0)
    cov_r, cov_s = np.cov(real, rowvar=False), np.cov(syn, rowvar=False)
    want = float(
        np.sum((mu_r - mu_s) ** 2)
        + np.trace(cov_r + cov_s - 2 * scipy.linalg.sqrtm(cov_r @ cov_s).real)
    )
    got = float(fid_from_features(jnp.array(real), jnp.array(syn)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fid_zero_for_identical_distributions():
    rng = np.random.RandomState(1)
    x = rng.randn(500, 8).astype(np.float32)
    assert abs(float(fid_from_features(jnp.array(x), jnp.array(x)))) < 1e-2


def test_inception_score_matches_numpy():
    rng = np.random.RandomState(2)
    p = rng.dirichlet(np.ones(8), size=100).astype(np.float32)
    eps = 1e-16
    p_y = np.mean(p, axis=0, keepdims=True)
    want = float(np.exp(np.mean(np.sum(p * (np.log(p + eps) - np.log(p_y + eps)), axis=1))))
    got = float(inception_score(jnp.array(p)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # uniform posterior -> IS == 1
    u = np.full((50, 8), 1 / 8, np.float32)
    np.testing.assert_allclose(float(inception_score(jnp.array(u))), 1.0, rtol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
def test_battery_matches_sklearn_with_8020_split(tmp_path, k):
    rng = np.random.RandomState(3)
    emb = rng.randn(200, 6).astype(np.float32)
    labels = rng.choice([0, 2, 3, 7], size=200).astype(np.int32)

    battery = train_classifier_battery(emb, labels, k=k)
    queries = rng.randn(31, 6).astype(np.float32)
    got = np.asarray(compute_posterior(battery, jnp.array(queries)))

    val_size = int(200 * 0.2)
    xt, yt = emb[:-val_size], labels[:-val_size]
    for ci, c in enumerate([0, 2, 3, 7]):
        clf = KNeighborsClassifier(n_neighbors=k).fit(xt, (yt == c).astype(np.uint8))
        want = clf.predict_proba(queries)[:, 1]
        np.testing.assert_allclose(got[:, ci], want, atol=1e-6)

    # persistence
    save_battery(tmp_path / "classifiers.msgpack", battery)
    b2 = load_battery(tmp_path / "classifiers.msgpack")
    got2 = np.asarray(compute_posterior(b2, jnp.array(queries)))
    np.testing.assert_array_equal(got, got2)


def test_battery_default_k_is_5():
    # the battery eval consumes is n_neighbors=5
    # (reference src/training/classifiers.py:184; util_classifiers.py:30's
    # k=3 is dead code)
    rng = np.random.RandomState(11)
    emb = rng.randn(50, 4).astype(np.float32)
    labels = rng.choice([0, 2], size=50).astype(np.int32)
    assert train_classifier_battery(emb, labels).k == 5


def test_error_reject_points_matches_reference_sweep():
    """Golden replay of src/training/classifiers.py:186-213 with sklearn."""
    from sklearn.metrics import accuracy_score

    from gan_discovery_pso_tpu.evaluation.classifiers import error_reject_points

    rng = np.random.RandomState(12)
    emb = rng.randn(150, 5).astype(np.float64)
    labels = rng.choice([0, 3, 7], size=150)
    val_size = int(150 * 0.2)
    x_train, x_valid = emb[:-val_size], emb[-val_size:]

    for c in (0, 3, 7):
        y = (labels == c).astype("uint8")
        y_train, y_valid = y[:-val_size], y[-val_size:]
        clf = KNeighborsClassifier(n_neighbors=5).fit(x_train, y_train)
        pred_bin = clf.predict(x_valid)
        pred = clf.predict_proba(x_valid)[:, 1]
        reliability = np.abs(1 - (pred / 0.5))
        want_rej, want_err = [], []
        for ths in np.linspace(0.0, 0.9, num=90):
            mask = reliability > ths
            want_rej.append((np.abs(np.sum(mask) - val_size) / val_size) * 100)
            want_err.append((1 - accuracy_score(y_valid[mask], pred_bin[mask])) * 100)

        got_rej, got_err, _ = error_reject_points(y_valid, pred)
        np.testing.assert_allclose(got_rej, want_rej, atol=1e-9)
        np.testing.assert_allclose(got_err, want_err, atol=1e-9)


def test_energy_variance_stats():
    p = np.array([[1.0, 0.0], [0.5, 0.5]], np.float32)
    np.testing.assert_allclose(np.asarray(posterior_energy(jnp.array(p))), [1.0, 0.5])
    np.testing.assert_allclose(np.asarray(posterior_variance(jnp.array(p))), [0.25, 0.0])


def test_denoise_recon_loss_runs():
    d = CAEDef(latent_dim=10)
    ep, es = cae_encoder_init(jax.random.key(0), d)
    dp, ds = cae_decoder_init(jax.random.key(1), d)
    imgs = jnp.asarray(np.random.RandomState(4).rand(8, 1, 28, 28), jnp.float32)
    loss = denoise_recon_loss(jax.random.key(2), ep, es, dp, ds, imgs)
    assert np.isfinite(float(loss)) and float(loss) > 0

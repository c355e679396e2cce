"""Tiny-config end-to-end pipeline integration test (SURVEY.md §4).

Runs the full stage chain on the CPU backend with shrunken models/data:
cae → classifiers → dcgan → cnn_multipatient → pso_discovery → inverter →
extractors → pso_inverter → regularize_inverter(+statistics) → vqvae →
analyses. Asserts every stage's artifact contract lands on disk.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.core import load_config
from gan_discovery_pso_tpu.pipelines import (
    StageContext,
    run_cae,
    run_classifiers,
    run_cnn_multipatient,
    run_dcgan,
    run_extractor,
    run_inverter,
    run_pso_analysis,
    run_pso_analysis_clustering,
    run_pso_analysis_distance,
    run_pso_discovery,
    run_pso_inverter,
    run_regularize_inverter,
    run_regularize_inverter_statistics,
    run_vqvae,
)

TINY = {
    "data.data_dir": None,  # set per-test to tmp
    "model_gan.network.units_gen": 8,
    "model_gan.network.units_disc": 8,
    "trainer_gan.z_dim": 8,
    "trainer_gan.batch_size": 32,
    "trainer_ae.batch_size": 32,
    "trainer_cnn.batch_size": 32,
    "trainer_pso.n_iterations": 4,
    "trainer_pso.n_particles": 8,
    "trainer_pso.dim_space": 8,
    "trainer_pso_inverter.n_iterations": 3,
    "trainer_pso_inverter.n_particles": 8,
    "trainer_pso_inverter.dim_space": 8,
    "trainer_pso_inverter.batch_size": 32,
    "trainer_inverter.batch_size": 32,
    "model_inverter.latent_space": 8,
    "model_ae.latent_space": 6,
}

LIMIT = 192  # images per dataset load


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    return {
        "data.data_dir": str(root / "raw"),
        "data.interim_dir": str(root / "interim"),
        "data.model_dir": str(root / "models"),
        "data.reports_dir": str(root / "reports"),
    }


def _ctx(roots, module, extra=None):
    overrides = {**TINY, **roots, **(extra or {})}
    ctx = StageContext.create("configs/dcgan_mnist.yaml", module, overrides=overrides)
    ctx.limit = LIMIT
    return ctx


@pytest.fixture(scope="module")
def artifacts(roots):
    """Run the whole chain once; individual tests assert on the pieces."""
    out = {}

    ctx = _ctx(roots, "cae")
    cae_state, cae_hist = run_cae(ctx, epochs=1)
    # denoise recon panel (reference util_cae.py:221 → img_loss.png)
    assert (ctx.run.reports_dir / "general" / "img_loss.png").exists()
    out["cae"] = (ctx, cae_state, cae_hist)

    ctx2 = _ctx(roots, "classifiers")
    battery = run_classifiers(ctx2, cae_state=cae_state)
    # battery-tree + embeddings artifacts (reference classifiers.py:150-239)
    assert (ctx2.run.reports_dir / "general" / "classifier_battery_tree.png").exists()
    assert (ctx2.run.interim_dir / "encoded_samples_train.csv").exists()
    assert (ctx2.run.interim_dir / "encoded_samples_valid.csv").exists()
    out["classifiers"] = (ctx2, battery)

    ctx3 = _ctx(roots, "dcgan")
    gan_state, gan_hist = run_dcgan(ctx3, cae_state, battery, epochs=1, n_synthetic=64)
    out["dcgan"] = (ctx3, gan_state, gan_hist)

    ctx4 = _ctx(roots, "cnn_multipatient")
    cnn_state, rdef = run_cnn_multipatient(ctx4, epochs=1)
    out["cnn"] = (ctx4, cnn_state, rdef)

    ctx5 = _ctx(roots, "pso_discovery")
    results = run_pso_discovery(
        ctx5, gan_state.gen_params, gan_state.gen_state,
        cnn_state.params, cnn_state.model_state, rdef,
        classes=(0, 2), make_plots=True,
    )
    out["pso"] = (ctx5, results)

    ctx6 = _ctx(roots, "inverter")
    enc_params, inv_hist = run_inverter(
        ctx6, gan_state.gen_params, gan_state.gen_state, epochs=1
    )
    out["inverter"] = (ctx6, enc_params, inv_hist)

    return out


def test_cae_stage_artifacts(artifacts):
    ctx, state, hist = artifacts["cae"]
    assert (ctx.run.models_dir / "encoder.msgpack").exists()
    assert (ctx.run.models_dir / "decoder.msgpack").exists()
    assert (ctx.run.interim_dir / "encoded_samples_train.csv").exists()
    assert len(hist["train_loss"]) == 1 and np.isfinite(hist["train_loss"][0])
    # run-id naming contract
    assert ctx.run.name == "00001--cae"


def test_classifier_stage_artifacts(artifacts):
    ctx, battery = artifacts["classifiers"]
    assert (ctx.run.models_dir / "classifiers.msgpack").exists()
    # the battery eval consumes is k=5 (reference training/classifiers.py:184)
    assert battery.k == 5
    # one reliability error-reject curve PER battery class (:186-213)
    for label in np.asarray(battery.classes):
        assert (ctx.run.reports_dir / "general" / f"error_reject_curve_{label}.png").exists()
    assert set(np.asarray(battery.classes)).issubset({0, 2, 3, 4, 6, 7, 8, 9})


def test_dcgan_stage_artifacts(artifacts):
    ctx, state, hist = artifacts["dcgan"]
    assert (ctx.run.models_dir / "checkpoint_g.msgpack").exists()
    assert (ctx.run.models_dir / "best_g.msgpack").exists()
    assert len(hist["fid"]) == 1 and np.isfinite(hist["fid"][0])
    assert len(hist["is"]) == 1
    # per-batch losses and per-epoch metrics on separate axes
    # (reference util_report_gan.py:9-45)
    assert (ctx.run.reports_dir / "training_plot" / "train_loss.png").exists()
    assert (ctx.run.reports_dir / "training_plot" / "fid.png").exists()
    assert (ctx.run.reports_dir / "training_plot" / "is.png").exists()
    # reference superimage name/location (util_report_gan.py:50-87)
    assert (ctx.run.reports_dir / "general" / "synthetic_images_0.png").exists()
    # reload roundtrip
    from gan_discovery_pso_tpu.pipelines import load_gan

    gp, gs = load_gan(ctx.run.models_dir)
    z = jnp.zeros((2, 8, 1, 1))
    from gan_discovery_pso_tpu.models import generator_forward

    img = generator_forward(gp, gs, z)
    assert img.shape == (2, 1, 28, 28)


def test_cnn_stage_artifacts(artifacts):
    ctx, state, rdef = artifacts["cnn"]
    assert (ctx.run.models_dir / "model.msgpack").exists()
    from gan_discovery_pso_tpu.pipelines import load_cnn

    params, mstate = load_cnn(ctx.run.models_dir, rdef)
    from gan_discovery_pso_tpu.models import resnet_apply

    logits, _ = resnet_apply(params, mstate, jnp.zeros((2, 1, 28, 28)), rdef)
    assert logits.shape == (2, 8)


def test_pso_discovery_stage_artifacts(artifacts):
    ctx, results = artifacts["pso"]
    for label in (0, 2):
        assert (ctx.run.interim_dir / f"particles_position_iid_class_{label}.pkl").exists()
        assert (ctx.run.interim_dir / f"particles_position_iic_class_{label}.pkl").exists()
        assert (ctx.run.interim_dir / f"particles_iid_class_{label}.npz").exists()
        res = results[label]
        assert np.isfinite(float(res.g_best_val))
        assert res.particle_trajectories().shape == (5, 8, 8)  # 4 iters + init
        # per-iteration generated-image grids, rendered post-hoc
        # (reference util_pso.py:127-133, pso_discovery.py:166-179)
        for it in range(1, 5):
            assert (
                ctx.run.reports_dir / "training_plot" / str(label)
                / f"pso_images_{it}.png"
            ).exists()
        # reference report layout (pso_discovery.py:222-237):
        # general/{label}/ convergence + diagnostics, training_plot/{label}/
        # per-dimension plots + grid GIF
        general = ctx.run.reports_dir / "general" / str(label)
        plots = ctx.run.reports_dir / "training_plot" / str(label)
        assert (general / "pso_iter.png").exists()
        assert (general / "mean_mse.png").exists()
        assert (plots / "pso_dim_0.png").exists()
        assert (plots / "pso_dim_last_iteration.png").exists()
        assert (plots / "iid_img.gif").exists()
    assert (ctx.run.reports_dir / "timing.json").exists()
    assert (ctx.run.reports_dir / "general" / "timing.pkl").exists()
    assert (ctx.run.reports_dir / "general" / "overall_history.pkl").exists()


def test_pso_discovery_2d_landscape_gif_single_mesh_eval(roots, artifacts, monkeypatch):
    """dim_space=2 emits the per-iteration landscape frames + GIF (reference
    pso_discovery.py:226-237), and the identical contour mesh is evaluated
    on device ONCE — not once per frame."""
    import gan_discovery_pso_tpu.pipelines.pso_discovery as pd

    _ctx1, cae_state, _ = artifacts["cae"]
    _ctx2, battery = artifacts["classifiers"]
    _ctx4, cnn_state, rdef = artifacts["cnn"]

    # dim_space must equal the GAN's z_dim (the reference's latent-dim sweep
    # trains one GAN per dim) — train a z_dim=2 tiny GAN for this test
    ctxG = _ctx(roots, "dcgan_z2", extra={"trainer_gan.z_dim": 2})
    gan_state, _ = run_dcgan(ctxG, cae_state, battery, epochs=1, n_synthetic=64)

    calls = {"n": 0}
    real_make = pd.make_discovery_fitness_dynamic

    def counting_make(*a, **kw):
        fit = real_make(*a, **kw)

        def wrapped(pos, ci):
            calls["n"] += 1
            return fit(pos, ci)

        return wrapped

    monkeypatch.setattr(pd, "make_discovery_fitness_dynamic", counting_make)
    ctx = _ctx(roots, "pso_discovery", extra={"trainer_pso.dim_space": 2})
    pd.run_pso_discovery(
        ctx, gan_state.gen_params, gan_state.gen_state,
        cnn_state.params, cnn_state.model_state, rdef,
        classes=(0,), make_plots=True, image_grids=False,
    )
    plots = ctx.run.reports_dir / "training_plot" / "0"
    general = ctx.run.reports_dir / "general" / "0"
    assert (plots / "2dspace_latent.gif").exists()
    frames = sorted(plots.glob("2d_plot_*.png"))
    assert len(frames) >= 2  # init + ≥1 iteration
    # grid pickles (reference pso_discovery.py:228-231)
    import pickle

    with open(general / "fitness_grid.pkl", "rb") as f:
        z_grid = pickle.load(f)
    assert z_grid.shape == (100, 100) and np.isfinite(z_grid).all()
    with open(general / "img_grid.pkl", "rb") as f:
        img_grid = pickle.load(f)
    assert img_grid.shape[0] == 100 * 100
    assert float(img_grid.max()) <= 1.0 and float(img_grid.min()) >= 0.0
    # one mesh eval total, despite len(frames) frames
    assert calls["n"] == 1


def test_inverter_stage_artifacts(artifacts):
    ctx, enc_params, hist = artifacts["inverter"]
    assert (ctx.run.models_dir / "encoder.msgpack").exists()
    assert np.isfinite(hist["train_loss"][0])
    # per-epoch visuals (reference util_inverter.py:259,280): phase recon
    # panels + fixed-noise sample grid
    for phase in ("train", "val_iid", "val_ood"):
        assert (ctx.run.reports_dir / "general" / f"img_loss_{phase}_0.png").exists()
    assert (ctx.run.reports_dir / "general" / "synthetic_images_0.png").exists()


def test_extractor_pso_inverter_and_regularize(roots, artifacts):
    _ctx3, gan_state, _ = artifacts["dcgan"]
    _ctx4, cnn_state, rdef = artifacts["cnn"]
    _ctx6, enc_params, _ = artifacts["inverter"]
    ctx5, _results = artifacts["pso"]

    # extractors
    ctxE = _ctx(roots, "iid_extractor")
    latents = run_extractor(ctxE, enc_params, kind="iid", max_per_class=16)
    assert set(latents) == set((0, 2, 3, 4, 6, 7, 8, 9))
    assert (ctxE.run.interim_dir / "particles_position_iid_class_0.pkl").exists()

    ctxO = _ctx(roots, "ood_extractor")
    ood_latents = run_extractor(ctxO, enc_params, kind="ood", max_per_class=16)
    assert set(ood_latents) == {1, 5}

    # hybrid pso inverter (patient = ood class 1)
    ctxP = _ctx(roots, "pso_inverter", extra={"pso_inverter.ood_patient": 1,
                                              "trainer_pso_inverter.epochs": 1})
    res, fine_state = run_pso_inverter(
        ctxP, gan_state.gen_params, gan_state.gen_state, enc_params,
        cnn_state.params, cnn_state.model_state, rdef,
    )
    assert (ctxP.run.interim_dir / "particles_position_ood_class_1.pkl").exists()
    assert (ctxP.run.models_dir / "model_1.msgpack").exists()
    assert np.isfinite(float(res.g_best_val))
    # swarm diagnostics + per-iteration grids + fine-tune figures, in the
    # reference layout nested under the patient id
    # (reference pso_inverter.py:263,326-346)
    assert (ctxP.run.reports_dir / "general" / "1" / "pso_iter.png").exists()
    assert (ctxP.run.reports_dir / "general" / "1" / "mean_mse.png").exists()
    assert (ctxP.run.reports_dir / "training_plot" / "train_val_loss_1.png").exists()
    assert (ctxP.run.reports_dir / "training_plot" / "1" / "pso_images_1.png").exists()
    assert (ctxP.run.reports_dir / "training_plot" / "1" / "iid_img.gif").exists()
    assert list((ctxP.run.reports_dir / "training_plot" / "1").glob("pso_dim_*.png"))
    assert (ctxP.run.reports_dir / "timing.json").exists()

    # gradient inversion
    ctxR = _ctx(roots, "regularize_inverter")
    ds_ood = ctxR.dataset("test", drange=(-1, 1))
    imgs = ds_ood.images[:2]
    z, hist = run_regularize_inverter(
        ctxR, gan_state.gen_params, gan_state.gen_state, enc_params, imgs,
        iterations=10, num_vis=2, labels=np.asarray(ds_ood.labels)[:2],
    )
    assert (ctxR.run.interim_dir / "inverted_z.npz").exists()
    # reference synthetic_images_{step}.png snapshots (util_inverter:622-624)
    for step in (0, 5, 10):
        assert (ctxR.run.reports_dir / "general" / f"synthetic_images_{step}.png").exists()
    assert "z" not in hist  # vis latents are consumed, not leaked
    # last-image ori/enc/inv triptych + inverted-latent DataFrame pickle
    # (reference regularize_inverter.py:171-190)
    for name in ("ori", "enc", "inv"):
        assert (ctxR.run.reports_dir / "general" / f"{name}.png").exists()
    import pickle

    with open(ctxR.run.interim_dir / "particles_position_ood.pkl", "rb") as f:
        df_ood = pickle.load(f)
    assert df_ood.shape == (2, z.reshape(2, -1).shape[1] + 1)
    assert df_ood.iloc[:, -1].dtype == np.uint8
    assert list(df_ood.iloc[:, -1]) == list(np.asarray(ds_ood.labels)[:2])

    ctxS = _ctx(roots, "regularize_inverter_statistics")
    z2, w, hist2 = run_regularize_inverter_statistics(
        ctxS, gan_state.gen_params, gan_state.gen_state, enc_params, imgs,
        pso_interim_dir=ctx5.run.interim_dir, classes=(0, 2), iterations=5,
    )
    assert (ctxS.run.interim_dir / "inverted_bn_z.npz").exists()
    assert (ctxS.run.interim_dir / "particles_position_ood.pkl").exists()
    assert (ctxS.run.reports_dir / "general" / "inv.png").exists()
    # per-image weight vectors over the 2 classes (reference runs B=1 with
    # fresh weights per image)
    assert w.shape == (2, 2)


def test_vqvae_and_analyses(roots, artifacts):
    _ctx3, gan_state, _ = artifacts["dcgan"]
    ctx5, _results = artifacts["pso"]

    ctxV = _ctx(roots, "vq_vae")
    # vqvae.yaml schema for the model/trainer blocks; reuse tiny dcgan cfg data
    vq_cfg = load_config("configs/vqvae.yaml", overrides={
        **{k: v for k, v in TINY.items() if not k.startswith(("trainer_cnn", "model_cnn"))},
        "data.data_dir": str(ctxV.data_cfg.data_dir),
        "data.interim_dir": str(ctxV.data_cfg.interim_dir),
        "data.model_dir": str(ctxV.data_cfg.model_dir),
        "data.reports_dir": str(ctxV.data_cfg.reports_dir),
        "model.latent_space.embedding_dim": 8,
        "model.latent_space.num_embedding": 16,
        "trainer.batch_size": 32,
        # only these classes have discovery artifacts in this tiny run
        "data.iid_classes": [0, 2],
    })
    ctxV = StageContext.create(vq_cfg, "vq_vae")
    ctxV.limit = LIMIT
    state, hist, d = run_vqvae(
        ctxV, gan_state.gen_params, gan_state.gen_state,
        pso_interim_dir=ctx5.run.interim_dir, epochs=1,
    )
    assert (ctxV.run.models_dir / "best_vqvae.msgpack").exists()
    assert np.isfinite(hist["train_loss"][0])
    # codebook was seeded from PSO particles (16 of them exist: 2 classes x 8)
    assert state.params["codebook"].shape == (16, 8)
    # per-epoch recon panels + end-of-training decoder samples (reference
    # vq_vae.py:221-227,234)
    for phase in ("train", "val_iid", "val_ood"):
        assert (ctxV.run.reports_dir / "general" / f"img_loss_{phase}_1.png").exists()
    assert (ctxV.run.reports_dir / "general" / "synthetic_images_0.png").exists()
    # per-epoch model checkpoint (reference vq_vae.py:244-245 model_{e+1}.pt)
    assert (ctxV.run.models_dir / "model_1.msgpack").exists()
    # per-component loss figures (reference utils_vq_vae/util_report.py:13-36)
    assert (ctxV.run.reports_dir / "training_plot" / "reconstruction_loss.png").exists()
    assert (ctxV.run.reports_dir / "training_plot" / "vq_loss.png").exists()
    assert np.isfinite(hist["train_loss_vq"][0])

    # pixelcnn prior from the trained vqvae run (the CLI pixelcnn-prior leg)
    from gan_discovery_pso_tpu.pipelines import run_pixelcnn_prior_from_vqvae

    ctxP = StageContext.create(vq_cfg, "pixelcnn_prior")
    ctxP.limit = 64
    _pp, pd, phist = run_pixelcnn_prior_from_vqvae(
        ctxP, ctxV.run.models_dir, epochs=1, batch_size=32)
    assert (ctxP.run.models_dir / "pixelcnn.msgpack").exists()
    assert np.isfinite(phist["train_loss"][0])
    assert pd.input_dim == 16  # conditioned on the vqvae codebook size

    # analyses over the discovery artifacts
    ctxA = _ctx(roots, "pso_analysis")
    r = run_pso_analysis(ctxA, ctx5.run.interim_dir, classes=(0, 2),
                         iter_step=4)
    assert (ctxA.run.reports_dir / "pca_iid.png").exists()
    assert r["pca"].shape[1] == 2
    # reference per-iteration projection artifacts (pso_analysis.py:92-124)
    plotsA = ctxA.run.reports_dir / "training_plot"
    assert (plotsA / "pca_space_0.png").exists()
    assert (plotsA / "pca_variance_plot_0.png").exists()
    assert (plotsA / "umap_space_0.png").exists()
    assert (plotsA / "pca_space.gif").exists()

    ctxC = _ctx(roots, "pso_analysis_clustering")
    rc = run_pso_analysis_clustering(ctxC, ctx5.run.interim_dir, classes=(0, 2),
                                     algorithm="kmeans")
    assert rc["centers"].shape == (2, 8)
    assert (ctxC.run.reports_dir / "clusters.png").exists()
    # reference artifacts (pso_analysis_clustering.py:174-228)
    assert (ctxC.run.models_dir / "kmeans.pkl").exists()
    plotsC = ctxC.run.reports_dir / "training_plot"
    assert (plotsC / "latent_space_pca.png").exists()
    assert (plotsC / "latent_space_umap.png").exists()

    ctxD = _ctx(roots, "pso_analysis_distance")
    rd = run_pso_analysis_distance(ctxD, ctx5.run.interim_dir, classes=(0, 2))
    assert "within_0" in rd and "between_0_2" in rd
    assert (ctxD.run.reports_dir / "distance_summary.json").exists()
    # reference figure pair incl. the filename typo
    # (pso_analysis_distance.py:225-226)
    assert (ctxD.run.reports_dir / "general" / "paiwise_mse.png").exists()
    assert (ctxD.run.reports_dir / "general"
            / "latent_kde_distribution.png").exists()


def test_vqvae_diagnoses_dim_mismatch(roots, artifacts):
    """embedding_dim drifting from the discovery run's dim_space (the
    reference config drift between vqvae.yaml's 100 and a smaller
    trainer_pso.dim_space) must fail with config guidance up front, not
    a reshape error inside the jitted VQ lookup."""
    _ctx3, gan_state, _ = artifacts["dcgan"]
    ctx5, _results = artifacts["pso"]

    ctxV = _ctx(roots, "vq_vae_mismatch")
    vq_cfg = load_config("configs/vqvae.yaml", overrides={
        **{k: v for k, v in TINY.items() if not k.startswith(("trainer_cnn", "model_cnn"))},
        "data.data_dir": str(ctxV.data_cfg.data_dir),
        "data.interim_dir": str(ctxV.data_cfg.interim_dir),
        "data.model_dir": str(ctxV.data_cfg.model_dir),
        "data.reports_dir": str(ctxV.data_cfg.reports_dir),
        "model.latent_space.embedding_dim": 100,  # artifacts are 8-dim
        "data.iid_classes": [0, 2],
    })
    ctxV = StageContext.create(vq_cfg, "vq_vae_mismatch")
    with pytest.raises(ValueError, match="embedding_dim"):
        run_vqvae(ctxV, gan_state.gen_params, gan_state.gen_state,
                  pso_interim_dir=ctx5.run.interim_dir, epochs=1)


def test_pso_discovery_sharded_full_artifact_contract(roots, artifacts):
    """shard_devices=N runs through the SAME pipeline and emits the full
    artifact set — timing.json, pickles, plots, per-iteration image grids —
    that the default path emits (r01 left --shard-swarm on a reduced
    CLI-only path)."""
    _ctx3, gan_state, _ = artifacts["dcgan"]
    _ctx4, cnn_state, rdef = artifacts["cnn"]

    ctx = _ctx(roots, "pso_discovery_sharded")
    results = run_pso_discovery(
        ctx, gan_state.gen_params, gan_state.gen_state,
        cnn_state.params, cnn_state.model_state, rdef,
        classes=(0,), shard_devices=2,
    )
    res = results[0]
    assert np.isfinite(float(res.g_best_val))
    assert (ctx.run.reports_dir / "timing.json").exists()
    assert (ctx.run.interim_dir / "particles_position_iid_class_0.pkl").exists()
    assert (ctx.run.interim_dir / "particles_position_iic_class_0.pkl").exists()
    assert (ctx.run.interim_dir / "particles_iid_class_0.npz").exists()
    assert (ctx.run.reports_dir / "general" / "0" / "pso_iter.png").exists()
    for it in range(1, 5):
        assert (ctx.run.reports_dir / "training_plot" / "0"
                / f"pso_images_{it}.png").exists()


def test_pso_discovery_batched_matches_contract(roots, artifacts):
    """Batched (vmapped) multi-class discovery produces the same artifact
    contract and per-class results consistent with independent swarms."""
    _ctx3, gan_state, _ = artifacts["dcgan"]
    _ctx4, cnn_state, rdef = artifacts["cnn"]

    ctx = _ctx(roots, "pso_discovery_batched")
    from gan_discovery_pso_tpu.pipelines import run_pso_discovery_batched

    results = run_pso_discovery_batched(
        ctx, gan_state.gen_params, gan_state.gen_state,
        cnn_state.params, cnn_state.model_state, rdef,
        classes=(0, 2), make_plots=False,
    )
    for label in (0, 2):
        res = results[label]
        assert np.isfinite(float(res.g_best_val))
        assert res.particle_trajectories().shape == (5, 8, 8)
        assert (ctx.run.interim_dir / f"particles_position_iid_class_{label}.pkl").exists()

    # same seeds as the sequential path -> identical trajectories
    ctx2 = _ctx(roots, "pso_discovery_seq_check")
    # rebuild with the same KeyChain seed: child(f"class_{label}") streams match
    seq = run_pso_discovery(
        ctx2, gan_state.gen_params, gan_state.gen_state,
        cnn_state.params, cnn_state.model_state, rdef,
        classes=(0, 2), make_plots=False,
    )
    for label in (0, 2):
        np.testing.assert_allclose(
            np.asarray(results[label].g_best_val),
            np.asarray(seq[label].g_best_val), rtol=1e-4, atol=1e-5,
        )


def test_cnn_per_class_battery(roots):
    """run_cnn trains one binary assessor per requested class and saves
    model_{label} artifacts (reference cnn.py:154-246)."""
    from gan_discovery_pso_tpu.pipelines import run_cnn

    ctx = _ctx(roots, "cnn")
    models = run_cnn(ctx, epochs=1, classes=(0, 2))
    assert set(models) == {0, 2}
    assert (ctx.run.models_dir / "model_0.msgpack").exists()
    assert (ctx.run.reports_dir / "cnn_0.png").exists()
    # evaluation-phase battery tree: every class's positive val slices
    # through every battery member (reference cnn.py:211-246)
    assert (ctx.run.reports_dir / "general" / "classifier_battery_tree.png").exists()
    # reload as binary assessor
    from gan_discovery_pso_tpu.models import ResNetDef, resnet_apply
    from gan_discovery_pso_tpu.pipelines import load_cnn

    rdef = ResNetDef("ResNet50", 1, 2, tuple(ctx.data_cfg.iid_classes))
    params, state = load_cnn(ctx.run.models_dir, rdef, label=0)
    logits, _ = resnet_apply(params, state, jnp.zeros((2, 1, 28, 28)), rdef)
    assert logits.shape == (2, 2)


def test_dcgan_resume_restores_history_and_epoch(roots, artifacts):
    """Resume continues from the checkpointed epoch with the metric history
    reloaded (reference util_dcgan.py:162-177)."""
    ctx_prev, _state, _hist = artifacts["dcgan"]
    _ctx1, cae_state, _ = artifacts["cae"]
    _ctx2, battery = artifacts["classifiers"]

    # resume inside the SAME run dir as the original dcgan stage
    ctx = _ctx(roots, "dcgan")
    ctx.run = ctx_prev.run
    ctx.ckpt = ctx_prev.ckpt
    state2, hist2 = run_dcgan(ctx, cae_state, battery, epochs=1, n_synthetic=64,
                              resume=True)
    # history reloaded (1 eval row from the original epoch) + 1 new row
    assert len(hist2["fid"]) == 2
    saved = ctx.ckpt.load("checkpoint_g.msgpack")
    assert saved["epoch"] == 1  # offset applied


def test_dcgan_resume_reconciles_history_ahead_of_checkpoint(roots, artifacts):
    """A kill in the window between the history-artifact write and the
    weights-checkpoint write (history first, checkpoint last — see
    run_dcgan) leaves the history one epoch AHEAD of the checkpoint; resume
    must truncate that epoch and re-run it, not duplicate it."""
    from gan_discovery_pso_tpu.core.checkpoint import load_pytree, save_pytree

    _ctx1, cae_state, _ = artifacts["cae"]
    _ctx2, battery = artifacts["classifiers"]

    ctxA = _ctx(roots, "dcgan_desync")
    run_dcgan(ctxA, cae_state, battery, epochs=1, n_synthetic=64)
    # simulate the kill window: the history artifact gained epoch 1 but the
    # checkpoint still says epoch 0
    hist_file = ctxA.run.reports_dir / "general" / "history_gan.msgpack"
    h = {k: np.asarray(v) for k, v in load_pytree(hist_file).items()}
    steps = len(h["loss_gen"])
    save_pytree(hist_file, {k: np.concatenate([v, v]) for k, v in h.items()})

    ctxB = _ctx(roots, "dcgan_desync_resume")
    ctxB.run = ctxA.run
    ctxB.ckpt = ctxA.ckpt
    _state, hist2 = run_dcgan(ctxB, cae_state, battery, epochs=1,
                              n_synthetic=64, resume=True)
    # exactly 2 epochs of history: the phantom epoch was truncated and the
    # real epoch 1 re-ran (not 3 epochs, and no interleaved duplicates)
    assert len(hist2["fid"]) == 2
    assert len(hist2["loss_gen"]) == 2 * steps
    # the append-mode jsonl was reconciled too: one row per epoch, steps
    # unique (the resume used to leave two contradictory rows per re-run
    # epoch)
    import json as _json

    rows = [_json.loads(l) for l in
            open(ctxA.run.reports_dir / "history_gan.jsonl")]
    row_steps = [r["step"] for r in rows]
    assert sorted(row_steps) == [0, 1] and len(set(row_steps)) == len(row_steps)


def test_dcgan_kill_and_resume_bit_identical(roots, artifacts):
    """Per-step RNG is keyed by ABSOLUTE (epoch, step), so a killed-and-
    resumed training run replays the single-shot tail exactly (SURVEY
    §5.3/5.4; the reference resumes only at epoch granularity with unsaved
    torch RNG state)."""
    _ctx1, cae_state, _ = artifacts["cae"]
    _ctx2, battery = artifacts["classifiers"]

    # single shot: 2 epochs
    ctxA = _ctx(roots, "dcgan_singleshot")
    stateA, _ = run_dcgan(ctxA, cae_state, battery, epochs=2, n_synthetic=64)

    # "killed" after 1 epoch ...
    ctxB = _ctx(roots, "dcgan_killed")
    run_dcgan(ctxB, cae_state, battery, epochs=1, n_synthetic=64)
    # ... and resumed in a FRESH context against the same run dir
    ctxB2 = _ctx(roots, "dcgan_killed_resume")
    ctxB2.run = ctxB.run
    ctxB2.ckpt = ctxB.ckpt
    run_dcgan(ctxB2, cae_state, battery, epochs=1, n_synthetic=64, resume=True)

    # compare the LAST-epoch checkpoints (the returned value is best-by-IS,
    # whose tracking legitimately restarts on resume)
    lastA = ctxA.ckpt.load("checkpoint_g.msgpack")
    lastB = ctxB2.ckpt.load("checkpoint_g.msgpack")
    assert lastA["epoch"] == lastB["epoch"] == 1
    for a, b in zip(jax.tree.leaves(lastA["state"]), jax.tree.leaves(lastB["state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pso_inverter_try_load_skips_finetune(roots, artifacts):
    """A pre-existing model_{patient} checkpoint short-circuits phase 1
    (reference pso_inverter.py:224-231)."""
    _ctx3, gan_state, _ = artifacts["dcgan"]
    _ctx4, cnn_state, rdef = artifacts["cnn"]
    _ctx6, enc_params, _ = artifacts["inverter"]

    ctx = _ctx(roots, "pso_inverter_resume", extra={
        "pso_inverter.ood_patient": 5, "trainer_pso_inverter.epochs": 1})
    # seed a fake fine-tuned assessor checkpoint
    from gan_discovery_pso_tpu.models import change_classifier_head

    reheaded = change_classifier_head(jax.random.key(99), cnn_state.params, 2)
    ctx.ckpt.save_state_dict("model_5", {"params": reheaded,
                                         "state": cnn_state.model_state})
    import time as _t

    t0 = _t.time()
    res, fine_state = run_pso_inverter(
        ctx, gan_state.gen_params, gan_state.gen_state, enc_params,
        cnn_state.params, cnn_state.model_state, rdef,
    )
    # loaded params == the seeded checkpoint (no training happened)
    np.testing.assert_array_equal(
        np.asarray(fine_state.params["fc"]["w"]), np.asarray(reheaded["fc"]["w"])
    )
    assert np.isfinite(float(res.g_best_val))


def test_inverter_attgan_variant(roots, artifacts):
    """encoder_variant: attgan trains the stateful AttGAN encoder through
    pix_rec (reference util_inverter.py:142-162) and saves the variant tag."""
    _ctx3, gan_state, _ = artifacts["dcgan"]
    ctx = _ctx(roots, "inverter_attgan",
               extra={"model_inverter.encoder_variant": "attgan"})
    enc_params, hist = run_inverter(
        ctx, gan_state.gen_params, gan_state.gen_state, epochs=2
    )
    assert len(hist["train_loss"]) == 2
    assert hist["train_loss"][1] <= hist["train_loss"][0] * 1.5  # not diverging
    from gan_discovery_pso_tpu.core.checkpoint import load_pytree

    saved = load_pytree(ctx.run.models_dir / "encoder.msgpack")
    assert saved["variant"] == "attgan"

    # the adversarial combination trains end-to-end too (the reference's
    # train-fn dispatch is encoder-agnostic, util_inverter.py:31-87)
    _ctx4, cnn_state, rdef = artifacts["cnn"]
    ctx2 = _ctx(roots, "inverter_attgan_adv", extra={
        "model_inverter.encoder_variant": "attgan",
        "trainer_inverter.training_function": "pix_fea_rec_adv"})
    _enc2, hist2 = run_inverter(
        ctx2, gan_state.gen_params, gan_state.gen_state,
        cnn=(cnn_state.params, cnn_state.model_state, rdef), epochs=2)
    for k in ("train_loss_enc", "val_iid_pixfea", "val_ood_pixfea"):
        assert k in hist2 and len(hist2[k]) == 2
        assert all(np.isfinite(v) for v in hist2[k]), k
    saved2 = load_pytree(ctx2.run.models_dir / "encoder.msgpack")
    assert saved2["variant"] == "attgan"
    assert "state" in saved2  # BN running stats travel with the checkpoint

    # an unknown training_function with attgan is rejected with a diagnosis
    import pytest as _pytest

    ctx3 = _ctx(roots, "inverter_attgan_bad", extra={
        "model_inverter.encoder_variant": "attgan",
        "trainer_inverter.training_function": "bogus"})
    with _pytest.raises(ValueError):
        run_inverter(ctx3, gan_state.gen_params, gan_state.gen_state, epochs=1)


def test_pixelcnn_prior_stage(roots):
    """Train the prior on synthetic codebook indices; loss must descend and
    conditional sampling must produce valid indices."""
    from gan_discovery_pso_tpu.pipelines import run_pixelcnn_prior
    from gan_discovery_pso_tpu.models import pixelcnn_generate, PixelCNNDef

    rng = np.random.RandomState(0)
    # class-dependent index distributions over a 4x4 grid
    labels = rng.randint(0, 2, 256)
    indices = (rng.randint(0, 4, (256, 4, 4)) + 4 * labels[:, None, None])

    ctx = _ctx(roots, "pixelcnn")
    params, d, hist = run_pixelcnn_prior(
        ctx, indices, labels, num_embedding=8, n_classes=2,
        epochs=3, batch_size=64, dim=16, n_layers=3,
    )
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert (ctx.run.models_dir / "pixelcnn.msgpack").exists()
    samp = pixelcnn_generate(params, d, jax.random.key(0),
                             jnp.array([0, 1]), shape=(4, 4))
    assert samp.shape == (2, 4, 4)
    assert int(samp.min()) >= 0 and int(samp.max()) < 8


def test_pso_discovery_batched_fast_math(roots, artifacts):
    """bf16 fast-math batched discovery runs and lands near the fp32 result."""
    _ctx3, gan_state, _ = artifacts["dcgan"]
    _ctx4, cnn_state, rdef = artifacts["cnn"]
    from gan_discovery_pso_tpu.pipelines import run_pso_discovery_batched

    ctx = _ctx(roots, "pso_discovery_bf16")
    res16 = run_pso_discovery_batched(
        ctx, gan_state.gen_params, gan_state.gen_state,
        cnn_state.params, cnn_state.model_state, rdef,
        classes=(0, 2), make_plots=False, fast_math_dtype=jnp.bfloat16,
    )
    ctx2 = _ctx(roots, "pso_discovery_fp32_cmp")
    res32 = run_pso_discovery_batched(
        ctx2, gan_state.gen_params, gan_state.gen_state,
        cnn_state.params, cnn_state.model_state, rdef,
        classes=(0, 2), make_plots=False,
    )
    for label in (0, 2):
        assert np.isfinite(float(res16[label].g_best_val))
        np.testing.assert_allclose(
            float(res16[label].g_best_val), float(res32[label].g_best_val), atol=0.05
        )


def test_pso_discovery_batched_fitness_chunk_override(roots, artifacts):
    """`--set trainer_pso.fitness_chunk=N` threads through the batched stage
    and leaves results bit-identical (chunked fitness is exact, pso/runner)."""
    _ctx3, gan_state, _ = artifacts["dcgan"]
    _ctx4, cnn_state, rdef = artifacts["cnn"]
    from gan_discovery_pso_tpu.pipelines import run_pso_discovery_batched

    ctx = _ctx(roots, "pso_discovery_chunked",
               extra={"trainer_pso.fitness_chunk": 4})
    chunked = run_pso_discovery_batched(
        ctx, gan_state.gen_params, gan_state.gen_state,
        cnn_state.params, cnn_state.model_state, rdef,
        classes=(0, 2), make_plots=False,
    )
    ctx2 = _ctx(roots, "pso_discovery_unchunked_cmp")
    plain = run_pso_discovery_batched(
        ctx2, gan_state.gen_params, gan_state.gen_state,
        cnn_state.params, cnn_state.model_state, rdef,
        classes=(0, 2), make_plots=False,
    )
    for label in (0, 2):
        np.testing.assert_array_equal(
            np.asarray(chunked[label].g_best_val),
            np.asarray(plain[label].g_best_val))
        np.testing.assert_array_equal(
            chunked[label].particle_trajectories(),
            plain[label].particle_trajectories())


def test_dcgan_stage_compute_dtype_override(roots, artifacts):
    """`--set trainer_gan.compute_dtype=bfloat16` trains the stage on the
    mixed-precision step: finite losses, fp32 checkpointed state."""
    _ctx1, cae_state, _ = artifacts["cae"]
    _ctx2, battery = artifacts["classifiers"]

    ctx = _ctx(roots, "dcgan_bf16",
               extra={"trainer_gan.compute_dtype": "bfloat16"})
    state, hist = run_dcgan(ctx, cae_state, battery, epochs=1, n_synthetic=16)
    assert np.isfinite(hist["loss_gen"]).all()
    assert np.isfinite(hist["fid"][-1])
    for leaf in jax.tree.leaves((state.gen_params, state.disc_params)):
        assert leaf.dtype == jnp.float32


def test_inverter_pix_fea_rec_adv_pipeline(roots, artifacts):
    """The adversarial inverter pipeline branch tracks all three reference
    phases (train/val_iid/val_ood, util_inverter.py:349) and selects the
    best encoder by val_iid pix+fea."""
    _ctx3, gan_state, _ = artifacts["dcgan"]
    _ctx4, cnn_state, rdef = artifacts["cnn"]

    ctx = _ctx(roots, "inverter_adv", extra={
        "trainer_inverter.training_function": "pix_fea_rec_adv"})
    enc_params, hist = run_inverter(
        ctx, gan_state.gen_params, gan_state.gen_state,
        cnn=(cnn_state.params, cnn_state.model_state, rdef), epochs=2,
    )
    for k in ("train_loss_enc", "val_iid_pixfea", "val_ood_pixfea"):
        assert k in hist and len(hist[k]) == 2
        assert all(np.isfinite(v) for v in hist[k]), k
    assert (ctx.run.models_dir / "encoder.msgpack").exists()
    # per-phase component series + reference G/D loss figures
    # (util_report_inverter.py:41-74)
    for k in ("train_loss_enc_adv", "train_loss_disc_r1penalty",
              "val_iid_loss_enc_rec_fea"):
        assert k in hist and len(hist[k]) == 2
    assert (ctx.run.reports_dir / "training_plot" / "train_G_losses.png").exists()
    assert (ctx.run.reports_dir / "training_plot" / "train_D_losses.png").exists()
    assert (ctx.run.reports_dir / "training_plot" / "val_iid_G_losses.png").exists()

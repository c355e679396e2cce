"""Analysis + reporting artifact tests (host-side, fast)."""

import numpy as np

from gan_discovery_pso_tpu.analysis import (
    assign_to_clusters,
    cluster_latents,
    get_clustering_algorithm,
    mutual_distance,
    pairwise_distances,
    pca_project,
    reporting,
    umap_project,
    voronoi_finite_polygons,
)


def _blobs(seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(40, 5) + np.array([3, 0, 0, 0, 0])
    b = rng.randn(40, 5) - np.array([3, 0, 0, 0, 0])
    return np.vstack([a, b]).astype(np.float32)


def test_pca_and_umap():
    x = _blobs()
    p2 = pca_project(x, 2)
    assert p2.shape == (80, 2)
    u2, method = umap_project(x, 2)
    assert u2.shape == (80, 2)
    assert method == "umap"  # real UMAP (umap_impl.py), no PCA fallback


def test_umap_impl_separates_blobs_and_transforms():
    """The from-scratch UMAP must keep the two well-separated blobs apart
    and embed out-of-sample points near their source blob."""
    from gan_discovery_pso_tpu.analysis.umap_impl import UMAP

    x = _blobs()
    um = UMAP(n_neighbors=10, n_epochs=100, random_state=0)
    emb = um.fit_transform(x)
    assert emb.shape == (80, 2) and np.isfinite(emb).all()
    ca, cb = emb[:40].mean(0), emb[40:].mean(0)
    spread = max(emb[:40].std(), emb[40:].std(), 1e-6)
    # inter-cluster distance dominates intra-cluster spread
    assert np.linalg.norm(ca - cb) > 2.0 * spread

    # transform: new points drawn from blob A land nearer A's centroid
    rng = np.random.RandomState(3)
    new_a = (rng.randn(10, 5) + np.array([3, 0, 0, 0, 0])).astype(np.float32)
    t = um.transform(new_a)
    assert t.shape == (10, 2) and np.isfinite(t).all()
    d_a = np.linalg.norm(t - ca, axis=1)
    d_b = np.linalg.norm(t - cb, axis=1)
    assert (d_a < d_b).mean() >= 0.9


def test_umap_spectral_init_runs_and_falls_back():
    """init="spectral" (umap-learn's default: eigenvectors of the normalized
    fuzzy-graph Laplacian) produces a valid layout on a connected graph, the
    layout loop itself is unchanged (same program cache), and degenerate
    graphs fall back to PCA instead of crashing."""
    from gan_discovery_pso_tpu.analysis.umap_impl import UMAP, _spectral_init

    x = _blobs()
    um = UMAP(n_neighbors=10, n_epochs=100, random_state=0, init="spectral")
    emb = um.fit_transform(x)
    assert emb.shape == (80, 2) and np.isfinite(emb).all()
    ca, cb = emb[:40].mean(0), emb[40:].mean(0)
    spread = max(emb[:40].std(), emb[40:].std(), 1e-6)
    assert np.linalg.norm(ca - cb) > 2.0 * spread

    # the spectral construction itself: connected 2-NN ring graph -> [N,2]
    edges = um._build_graph(np.asarray(x, np.float64))[1]
    init = _spectral_init(len(x), edges, 2)
    assert init is not None and init.shape == (80, 2)
    assert np.isfinite(init).all()

    # disconnected graph (two components, zero cross weights) -> None
    heads = np.array([0, 1, 2, 3]); tails = np.array([1, 0, 3, 2])
    w = np.ones(4)
    assert _spectral_init(12, (heads, tails, w), 2) is None
    # too few points -> None
    assert _spectral_init(3, (heads[:2], tails[:2], w[:2]), 2) is None

    # end-to-end fallback: tiny input still fits via PCA init
    tiny = np.asarray(_blobs()[:6], np.float64)
    emb2 = UMAP(n_neighbors=3, n_epochs=10, init="spectral").fit_transform(tiny)
    assert emb2.shape == (6, 2) and np.isfinite(emb2).all()

    import pytest
    with pytest.raises(ValueError):
        UMAP(init="bogus")


def test_umap_layout_program_reused_across_fits():
    """Per-iteration analysis sweeps fit UMAP dozens of times on same-shaped
    inputs; the jitted layout must compile ONCE (edge axis is padded to
    power-of-two buckets, arrays enter as arguments — umap_impl._layout_fn),
    not once per fit like the old per-call jit(lambda) closure did."""
    from gan_discovery_pso_tpu.analysis import umap_impl
    from gan_discovery_pso_tpu.analysis.umap_impl import UMAP as UMAP_CLS

    x = _blobs()
    kw = dict(n_neighbors=10, n_epochs=20, random_state=0)
    e1 = UMAP_CLS(**kw).fit_transform(x)
    run = umap_impl._layout_fn(20, 5, True, False)
    size0 = run._cache_size()
    assert size0 >= 1
    # same shapes (same padded edge bucket) → zero new compiles
    e2 = UMAP_CLS(**kw).fit_transform(x + 0.01)
    assert run._cache_size() == size0
    assert umap_impl._layout_fn(20, 5, True, False) is run
    # determinism with identical input is preserved across the cache
    e3 = UMAP_CLS(**kw).fit_transform(x)
    np.testing.assert_allclose(e1, e3, rtol=0, atol=0)
    assert e2.shape == e1.shape


def test_savefig_fast_figures_mode(tmp_path, monkeypatch):
    """GDPT_FAST_FIGURES: the first save of each filename pattern always
    rasterizes (every figure kind gets >=1 real render per process);
    repeats become a real (1x1) PNG at the contracted path unless the
    deterministic 1-in-8 path-hash sample hits; production mode renders
    everything."""
    import zlib

    from PIL import Image

    from gan_discovery_pso_tpu.analysis import reporting as rep

    def crc(n):
        # mirror _render_anyway's key: parent-dir name + filename
        return zlib.crc32(f"{tmp_path.name}/{n}".encode()) % 8

    # s<i>.png names all share the digit-normalized pattern "sN.png"
    stub_name = next(f"s{i}.png" for i in range(64) if crc(f"s{i}.png") != 0)
    full_name = next(f"s{i}.png" for i in range(64) if crc(f"s{i}.png") == 0)

    monkeypatch.setattr(rep, "_FAST_FIGURES", False)
    p = rep.plot_convergence([3, 2, 1], tmp_path / stub_name)
    with Image.open(p) as im:
        assert im.size[0] > 50  # production mode: real raster regardless

    monkeypatch.setattr(rep, "_FAST_FIGURES", True)
    monkeypatch.setattr(rep, "_RENDERED_PATTERNS", set())
    p = rep.plot_convergence([3, 2, 1], tmp_path / stub_name)
    with Image.open(p) as im:
        assert im.size[0] > 50  # first save of the pattern: real raster
    p = rep.plot_convergence([3, 2, 1], tmp_path / stub_name)
    with Image.open(p) as im:
        assert im.size == (1, 1)  # repeat, unsampled: decodable 1x1 stub
    p = rep.plot_convergence([3, 2, 1], tmp_path / full_name)
    with Image.open(p) as im:
        assert im.size[0] > 50  # repeat pattern but sampled: rasterizes


def test_clustering_factory_and_assignment():
    x = _blobs(1)
    for algo in ("kmeans", "em", "expectation_maximization"):
        labels, centers, model = cluster_latents(x, algo, 2)
        assert labels.shape == (80,)
        assert centers.shape == (2, 5)
        # two blobs must be separated
        assert 0.4 < labels[:40].mean() < 0.6 or labels[:40].mean() in (0.0, 1.0)
        new = assign_to_clusters(model, x[:5])
        assert new.shape == (5,)
    try:
        get_clustering_algorithm("bogus", 2)
        assert False
    except ValueError:
        pass


def test_mutual_and_pairwise_distances():
    a = np.array([[0.0, 0.0], [3.0, 4.0]])
    b = np.array([[0.0, 0.0]])
    np.testing.assert_allclose(mutual_distance(a, b), [0.0, 5.0])
    np.testing.assert_allclose(pairwise_distances(a), [5.0])
    # matches the reference's loop semantics on random data
    rng = np.random.RandomState(2)
    x, y = rng.randn(7, 3), rng.randn(5, 3)
    want = np.array([np.linalg.norm(xi - yj) for xi in x for yj in y])
    np.testing.assert_allclose(mutual_distance(x, y), want, rtol=1e-5)


def test_voronoi_finite_polygons():
    rng = np.random.RandomState(3)
    pts = rng.randn(12, 2)
    regions, vertices = voronoi_finite_polygons(pts)
    assert len(regions) == 12
    for r in regions:
        assert len(r) >= 3  # every region is a closed polygon
        assert all(v >= 0 for v in r)


def test_report_artifacts(tmp_path):
    # convergence + GIF
    p1 = reporting.plot_convergence([3, 2, 1.5, 1.2], tmp_path / "conv.png")
    assert p1.exists()
    traj = np.random.RandomState(4).randn(6, 5, 3)
    paths = reporting.plot_particle_dimensions(traj, tmp_path / "dims")
    assert len(paths) == 3 and all(p.exists() for p in paths)
    gif = reporting.make_gif(paths, tmp_path / "anim.gif")
    assert gif.exists()

    # 2-D landscape through a batched fitness fn
    fit = lambda mesh: np.sum(mesh**2, axis=1)
    p2 = reporting.plot_fitness_landscape_2d(
        fit, center=[0.0, 0.0], out_path=tmp_path / "land.png",
        positions=np.random.randn(8, 2), resolution=20,
    )
    assert p2.exists()

    # curves, grids, scatters, voronoi, histograms, polarization
    assert reporting.plot_training_curves({"a": [1, 2], "b": [2, 1]}, tmp_path / "c.png").exists()
    imgs = np.random.RandomState(5).rand(10, 1, 28, 28)
    assert reporting.image_grid(imgs, tmp_path / "grid.png").exists()
    pts = np.random.RandomState(6).randn(30, 2)
    labs = np.repeat([0, 1, 2], 10)
    assert reporting.plot_scatter_2d(pts, labs, tmp_path / "sc.png", centers=pts[:3]).exists()
    assert reporting.plot_voronoi(pts[:10], tmp_path / "vor.png").exists()
    assert reporting.plot_distance_histogram(np.abs(np.random.randn(100)), tmp_path / "h.png").exists()
    p_yx = np.random.RandomState(7).dirichlet(np.ones(4), 20)
    assert reporting.plot_posterior_polarization(p_yx, [0, 2, 3, 7], tmp_path / "pol.png").exists()


def test_pso_inverter_analysis_stage(tmp_path):
    """Dedicated per-patient cluster-assignment stage (reference
    src/training/pso_inverter_analysis.py:180-210): model pkl, per-patient
    assignment report, pca+umap latent-space plots with OoD overlay."""
    from gan_discovery_pso_tpu.core import load_config
    from gan_discovery_pso_tpu.pipelines import (
        StageContext,
        run_pso_inverter_analysis,
    )
    from gan_discovery_pso_tpu.pso.io import save_particle_histories

    rng = np.random.RandomState(5)
    iid_dir = tmp_path / "iid"
    ood_dir = tmp_path / "ood"
    # two IiD classes with separated particle clouds; the OoD patient's
    # latents sit on class 2's cloud
    offsets = {0: -4.0, 2: 4.0}
    for label, off in offsets.items():
        traj = rng.randn(3, 16, 6).astype(np.float32) + off
        save_particle_histories(iid_dir, label, traj, np.zeros_like(traj), "iid")
    ood_traj = rng.randn(3, 12, 6).astype(np.float32) + 4.0
    save_particle_histories(ood_dir, 1, ood_traj, np.zeros_like(ood_traj), "ood")

    cfg = load_config("configs/dcgan_mnist.yaml", overrides={
        "data.data_dir": str(tmp_path / "raw"),
        "data.interim_dir": str(tmp_path / "interim"),
        "data.model_dir": str(tmp_path / "models"),
        "data.reports_dir": str(tmp_path / "reports"),
    })
    ctx = StageContext.create(cfg, "pso_inverter_analysis")
    report = run_pso_inverter_analysis(ctx, iid_dir, ood_dir, ood_patient=1,
                                       classes=(0, 2), algorithm="kmeans")

    assert report["n_ood_latents"] == 12
    assert len(report["cluster_assignment"]) == 12
    # all OoD latents land in ONE cluster (they sit on class 2's cloud)
    assert len(report["cluster_counts"]) == 1
    assert (ctx.run.models_dir / "kmeans.pkl").exists()
    assert (ctx.run.reports_dir / "ood_patient_1_cluster_assignment.json").exists()
    for method in ("pca", "umap"):
        assert (ctx.run.reports_dir / "training_plot" / f"latent_space_{method}.png").exists()
        assert (ctx.run.reports_dir / "training_plot"
                / f"latent_space_{method}_ood_1.png").exists()


def test_cv_evaluator_and_error_reject(tmp_path):
    rng = np.random.RandomState(8)
    ev = reporting.CvEvaluator()
    for _ in range(3):
        y = rng.randint(0, 2, 60)
        s = np.clip(y * 0.6 + rng.rand(60) * 0.5, 0, 1)
        ev.add_fold(y, s)
    summ = ev.summary()
    assert 0.5 < summ["auc_mean"] <= 1.0
    assert ev.plot_roc(tmp_path / "roc.png").exists()

    # the reference's results.xlsx score table (per fold + MEAN row,
    # util_report.py:275-289,385,421) — round-trips through our xlsx reader
    from gan_discovery_pso_tpu.data.xlsx import read_xlsx

    p = ev.write_results_xlsx(tmp_path / "results.xlsx")
    table = read_xlsx(p)
    # per-fold rows + the reference's MEAN and STD aggregate rows
    # (on_experiments_end, util_report.py:413-422)
    assert table["fold"] == [0.0, 1.0, 2.0, "MEAN", "STD"]
    for k in ev.METRIC_KEYS:
        assert len(table[k]) == 5
        if k in ev.RATIO_KEYS:
            # np.mean/np.std over the folds (NaN folds would propagate,
            # matching the reference aggregate)
            assert abs(table[k][3] - np.mean(table[k][:3])) < 1e-9
            assert abs(table[k][4] - np.std(table[k][:3])) < 1e-9
        else:
            # confusion counts are per-fold only; aggregates stay empty
            assert table[k][3] is None and table[k][4] is None

    # reference reliability-threshold sweep: 90 points, percentages
    rr, err = reporting.error_reject_curve(y, s, tmp_path / "er.png", label=1)
    assert len(rr) == len(err) == 90
    assert np.all((0 <= rr) & (rr <= 100)) and np.all((0 <= err) & (err <= 100))
    # raising the reliability bar can only reject more
    assert np.all(np.diff(rr) >= -1e-9)
    assert (tmp_path / "er.png").exists()


def test_plot_img_latent_space_layout(tmp_path):
    """Reference layout parity (util_cae.py:355-374): rows span r1 BOTTOM-up,
    columns span r0 left-to-right — the decoder output for the smallest
    (x, y) lands in the bottom-left tile."""
    import numpy as np

    from gan_discovery_pso_tpu.analysis import reporting

    w, n = 4, 3

    def decode(z):
        # each tile filled with its latent x value; bottom row = y min
        return np.repeat(np.asarray(z)[:, 0], w * w).reshape(-1, 1, w, w)

    p = reporting.plot_img_latent_space(decode, tmp_path, r0=(-1, 1),
                                        r1=(-1, 1), n=n, w=w)
    assert p.exists() and p.name == "img_latent_r0_-1_1__r1_-1_1.png"


def test_plot_latent_space_files(tmp_path):
    import numpy as np

    from gan_discovery_pso_tpu.analysis import reporting

    emb = np.random.RandomState(0).randn(20, 2)
    labs = np.repeat([0, 1], 10)
    p1 = reporting.plot_latent_space(emb, labs, tmp_path, dataset="Training")
    p2 = reporting.plot_latent_space(emb, labs, tmp_path, dataset="Validation")
    assert p1.name == "latent_space_Training.png" and p1.exists()
    assert p2.name == "latent_space_Validation.png" and p2.exists()


def test_new_reporting_helpers(tmp_path):
    """Round-2 reference-parity plot helpers: mean_mse, last-iteration
    particle scatter, pca variance, distance curves/kde, posterior
    hist+kde pairs, regularize-inverter losses, GMM ellipsoids."""
    rng = np.random.RandomState(11)
    assert reporting.plot_mean_mse(rng.rand(10), tmp_path / "mm.png").exists()
    assert reporting.plot_particles_last_iteration(
        rng.randn(8, 4), tmp_path / "last.png").exists()
    assert reporting.plot_pca_variance([3.0, 2.0, 1.0],
                                       tmp_path / "var.png").exists()
    assert reporting.plot_sorted_distance_curves(
        {"0": rng.rand(50), "mutual": rng.rand(30)},
        tmp_path / "paiwise_mse.png").exists()
    assert reporting.plot_distance_kde(
        {"0": rng.rand(50)}, tmp_path / "kde.png").exists()
    paths = reporting.plot_posterior_histograms(
        {"energy": rng.rand(40) + 0.2, "variance": rng.rand(40) * 0.05},
        tmp_path, epoch=3)
    names = {p.name for p in paths}
    assert names == {"hist_energy_3.png", "kde_energy_3.png",
                     "hist_variance_3.png", "kde_variance_3.png"}
    assert reporting.plot_regularize_inverter_losses(
        {"loss_pix": rng.rand(5), "loss_reg": rng.rand(5),
         "loss": rng.rand(5)}, tmp_path / "ri.png").exists()
    # degenerate inputs must not crash (constant values -> no kde line)
    reporting.plot_distance_kde({"c": np.ones(5)}, tmp_path / "kde2.png")
    reporting.plot_posterior_histograms({"energy": np.ones(5)}, tmp_path, 0)
    # GMM ellipsoids
    from gan_discovery_pso_tpu.analysis import cluster_latents

    pts = np.vstack([rng.randn(30, 2) + 3, rng.randn(30, 2) - 3])
    labs, _c, gmm = cluster_latents(pts, "em", 2, seed=0)
    assert reporting.plot_ellipsoids(
        pts, labs, gmm.means_, gmm.covariances_, tmp_path / "ell.png",
        dim_red_algorithm="pca").exists()
    # vqvae component figures: only pairs whose series both exist are drawn
    paths = reporting.plot_vqvae_losses(
        {"train_loss_recons": [1.0, 0.5], "val_ood_loss_recons": [1.1, 0.6]},
        tmp_path)
    assert [p.name for p in paths] == ["reconstruction_loss.png"]
    paths = reporting.plot_vqvae_losses(
        {"train_loss_recons": [1.0], "val_ood_loss_recons": [1.1],
         "train_loss_vq": [0.2], "val_ood_loss_vq": [0.3]}, tmp_path)
    assert {p.name for p in paths} == {"reconstruction_loss.png", "vq_loss.png"}
    # grayscale single-image writer (reference save_image)
    img = (rng.rand(28, 28) * 255).astype(np.uint8)
    p = reporting.save_grayscale(tmp_path / "ori.png", img)
    from PIL import Image

    assert np.array_equal(np.asarray(Image.open(p)), img)
    # 3-row denoise panel
    assert reporting.denoise_panel(
        rng.rand(4, 1, 8, 8), rng.rand(4, 1, 8, 8), rng.rand(4, 1, 8, 8),
        tmp_path / "img_loss.png", n_img=4).exists()


def test_cv_evaluator_mean_roc_and_scores(tmp_path):
    """CvEvaluator's reference-parity extras: mean_roc_{group}.png
    (util_report.py:440-466) and overall_scores.pkl (:409-411)."""
    rng = np.random.RandomState(3)
    ev = reporting.CvEvaluator()
    for _ in range(3):
        y = rng.randint(0, 2, 40)
        s = np.clip(y * 0.6 + rng.rand(40) * 0.5, 0, 1)
        ev.add_fold(y, s)
    p = ev.plot_mean_roc(tmp_path / "mean_roc_slices.png", group="slices")
    assert p is not None and p.exists()
    sp = ev.save_overall_scores(tmp_path / "overall_scores.pkl")
    import pickle

    with open(sp, "rb") as f:
        slices, patients = pickle.load(f)
    assert len(slices) == 3 and patients == []
    assert {"accuracy", "auc", "g"} <= set(slices[0])
    # all-one-class folds degrade to None instead of crashing
    ev2 = reporting.CvEvaluator()
    ev2.add_fold(np.ones(10, int), np.linspace(0, 1, 10))
    assert ev2.plot_mean_roc(tmp_path / "m2.png") is None


def test_clustering_stage_em_with_ood_overlay(tmp_path):
    """run_pso_analysis_clustering emits the reference artifact set
    (pso_analysis_clustering.py:174-228): {algorithm}.pkl, full-dim
    latent_space(.png) + GMM ellipsoid at dim 2, per dim-reduction
    latent_space_{alg}.png (+ ellipsoid_{alg}.png for em) and per-OoD-label
    overlays."""
    from gan_discovery_pso_tpu.core import load_config
    from gan_discovery_pso_tpu.pipelines import (
        StageContext,
        run_pso_analysis_clustering,
    )
    from gan_discovery_pso_tpu.pso.io import save_particle_histories

    rng = np.random.RandomState(7)
    iid_dir = tmp_path / "iid"
    ood_dir = tmp_path / "ood"
    for label, off in ((0, -3.0), (2, 3.0)):
        traj = rng.randn(3, 12, 2).astype(np.float32) + off
        save_particle_histories(iid_dir, label, traj, np.zeros_like(traj), "iid")
    ood_traj = rng.randn(3, 6, 2).astype(np.float32) + 3.0
    save_particle_histories(ood_dir, 1, ood_traj, np.zeros_like(ood_traj), "ood")

    cfg = load_config("configs/dcgan_mnist.yaml", overrides={
        "data.data_dir": str(tmp_path / "raw"),
        "data.interim_dir": str(tmp_path / "interim"),
        "data.model_dir": str(tmp_path / "models"),
        "data.reports_dir": str(tmp_path / "reports"),
    })
    ctx = StageContext.create(cfg, "pso_analysis_clustering")
    rc = run_pso_analysis_clustering(
        ctx, iid_dir, ood_interim_dir=ood_dir, classes=(0, 2),
        ood_labels=(1,), algorithm="em",
    )
    plots = ctx.run.reports_dir / "training_plot"
    assert (ctx.run.models_dir / "em.pkl").exists()
    assert (plots / "latent_space.png").exists()
    assert (plots / "ellipsoid_Gaussian Mixture.png").exists()
    for alg in ("pca", "umap"):
        assert (plots / f"latent_space_{alg}.png").exists()
        assert (plots / f"ellipsoid_{alg}.png").exists()
        assert (plots / f"latent_space_{alg}_ood_1.png").exists()
    assert (plots / "latent_space_ood_1.png").exists()
    assert "ood_assignment" in rc and len(rc["ood_assignment"]) == 6
    assert (ctx.run.reports_dir / "ood_cluster_assignment.json").exists()


def test_superimage_reference_layout(tmp_path):
    """The reference superimage rule (save_synthetic_images,
    util_report_gan.py:50-87): side = round_half_up(sqrt(N)) =
    int(ceil(sqrt(N)+0.5)), blank slots are ZERO images in model drange
    (mid-gray once (-1,1) maps to [0,255]), tiles concatenated unpadded."""
    assert reporting.round_half_up(np.sqrt(16)) == 5
    assert reporting.round_half_up(np.sqrt(64)) == 9
    assert reporting.round_half_up(np.sqrt(32)) == 7

    rng = np.random.RandomState(0)
    imgs = rng.uniform(-1, 1, size=(32, 1, 8, 8)).astype(np.float32)
    p = reporting.superimage(imgs, tmp_path / "synthetic_images_0.png",
                             drange=(-1, 1), cap=16)
    from PIL import Image

    arr = np.asarray(Image.open(p))
    # 16 capped images -> side 5 -> 40x40 canvas of 8x8 tiles, no padding
    assert arr.shape == (40, 40)
    # first tile is the first image rescaled (-1,1) -> (0,255)
    expect = ((imgs[0, 0] * 0.5 + 0.5) * 255.0 + 0.5).astype(np.uint8)
    assert np.array_equal(arr[:8, :8], expect)
    # a blank slot (index 16 of 25, i.e. row 3 col 1) is mid-gray 127/128
    assert abs(int(arr[3 * 8, 1 * 8]) - 127) <= 1

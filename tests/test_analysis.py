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


def test_pca_and_umap_fallback():
    x = _blobs()
    p2 = pca_project(x, 2)
    assert p2.shape == (80, 2)
    u2, method = umap_project(x, 2)
    assert u2.shape == (80, 2)
    assert method in ("umap", "pca-fallback")


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

    rr, err = reporting.error_reject_curve(y, s, tmp_path / "er.png")
    assert len(rr) == len(err) == 60
    # rejecting low-confidence samples should not increase error at the tail
    assert err[-1] <= err[0] + 1e-9

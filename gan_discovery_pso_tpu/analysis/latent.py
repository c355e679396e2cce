"""Latent-space analyses: projections, clustering, distance statistics.

Host-side by design (these are offline, matplotlib/sklearn-shaped workloads,
SURVEY.md §7 layer 7), mirroring reference src/utils/util_latent_analysis.py:

- PCA (:16-43) and UMAP (:45-64; umap-learn is uninstallable here, so the
  embedding comes from the from-scratch implementation of the published
  algorithm in analysis/umap_impl.py — a real UMAP, not a fallback);
- KMeans (:245-270) and GMM/EM (:272-300) with the same factory string
  names ('kmeans' / 'em' / 'expectation_maximization', :8-14);
- Voronoi regions with infinite-region reconstruction (:66-166);
- `mutual_distance` — the O(N·M) pairwise loop (:316-328) vectorized;
- `upload_pso_particles` equivalent lives in pso/io.py
  (load_particle_trajectories / load_final_particle_positions).
"""

from __future__ import annotations

import numpy as np


def pca_project(data: np.ndarray, n_components: int = 2, return_model: bool = False):
    from sklearn.decomposition import PCA

    model = PCA(n_components=n_components)
    out = model.fit_transform(np.asarray(data))
    return (out, model) if return_model else out


def make_umap(n_components: int = 2, n_neighbors: int = 15,
              min_dist: float = 0.1, random_state: int = 42,
              init: str = "pca"):
    """A UMAP reducer with fit_transform/transform: umap-learn when
    installed, otherwise this package's from-scratch implementation
    (analysis/umap_impl.py — the published algorithm with a JAX layout
    loop; umap-learn is not installable in this environment).

    init: "pca" (deterministic default) or "spectral" (umap-learn's
    default — normalized fuzzy-graph Laplacian eigenvectors, layout-
    comparable to reference figures; falls back to PCA on degenerate
    graphs)."""
    try:
        import umap  # type: ignore

        return umap.UMAP(
            n_components=n_components, n_neighbors=n_neighbors,
            min_dist=min_dist, random_state=random_state, init=init,
        ), "umap"
    except ImportError:
        from gan_discovery_pso_tpu.analysis.umap_impl import UMAP

        return UMAP(
            n_components=n_components, n_neighbors=n_neighbors,
            min_dist=min_dist, random_state=random_state, init=init,
        ), "umap"


def umap_project(data: np.ndarray, n_components: int = 2, n_neighbors: int = 15,
                 min_dist: float = 0.1, random_state: int = 42):
    """Real UMAP embedding (reference util_latent_analysis.py:45-64).
    Returns (embedding, 'umap'); the tag is kept for callers that logged
    the former PCA fallback."""
    reducer, tag = make_umap(n_components, n_neighbors, min_dist, random_state)
    return reducer.fit_transform(np.asarray(data)), tag


def get_clustering_algorithm(name: str, n_clusters: int, seed: int = 42,
                             data=None):
    """Factory matching the reference's names AND hyper-parameters
    (util_pso_analysis.py:8-14; kmeans_fun/em_fun,
    util_latent_analysis.py:245-300): KMeans(k-means++, n_init=10); the
    GMM seeds means_init from a 1-iteration k-means++ GMM when `data` is
    given (get_initial_means, :272-275), tol=1e-9, max_iter=2000."""
    from sklearn.cluster import KMeans
    from sklearn.mixture import GaussianMixture

    if name == "kmeans":
        return KMeans(init="k-means++", n_clusters=n_clusters,
                      random_state=seed, n_init=10)
    if name in ("em", "expectation_maximization"):
        means_init = None
        if data is not None:
            means_init = GaussianMixture(
                n_components=n_clusters, init_params="k-means++",
                tol=1e-9, max_iter=1, random_state=seed,
            ).fit(np.asarray(data, np.float64)).means_
        return GaussianMixture(n_components=n_clusters, means_init=means_init,
                               tol=1e-9, max_iter=2000, random_state=seed)
    raise ValueError(name)


def cluster_latents(data: np.ndarray, algorithm: str, n_clusters: int, seed: int = 42):
    """Fit + predict; returns (labels, centers, model). GMM centers are the
    component means (reference :272-300)."""
    data = np.asarray(data, np.float64)  # reference fits .astype('double')
    model = get_clustering_algorithm(algorithm, n_clusters, seed, data=data)
    labels = model.fit_predict(data)
    centers = model.cluster_centers_ if hasattr(model, "cluster_centers_") else model.means_
    return labels, centers, model


def assign_to_clusters(model, data: np.ndarray) -> np.ndarray:
    """Cluster assignment of new points (OoD-patient → discovered-cluster
    mapping, reference src/training/pso_inverter_analysis.py:180-210).
    Predicts as float64 like the reference's .astype('double') (:205) —
    sklearn's KMeans requires the fit dtype at predict time."""
    return model.predict(np.asarray(data, np.float64))


def mutual_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """All ‖a_i − b_j‖ pairs, flattened — the reference's nested loop
    (util_latent_analysis.py:316-328) as one broadcast."""
    a, b = np.asarray(a), np.asarray(b)
    d = np.sqrt(np.maximum(
        (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :] - 2.0 * a @ b.T, 0.0
    ))
    return d.ravel()


def pairwise_distances(a: np.ndarray) -> np.ndarray:
    """Unordered within-set distances (reference Swarm.mse loop shape,
    src/pso/util_pso.py:76-86)."""
    a = np.asarray(a)
    d = mutual_distance(a, a).reshape(len(a), len(a))
    iu = np.triu_indices(len(a), k=1)
    return d[iu]


def voronoi_finite_polygons(points: np.ndarray, radius: float | None = None):
    """2-D Voronoi regions with infinite regions closed at `radius` —
    the reconstruction the reference plots (util_latent_analysis.py:66-166).
    Returns (regions: list[list[int]], vertices: np.ndarray)."""
    from scipy.spatial import Voronoi

    vor = Voronoi(np.asarray(points))
    if radius is None:
        radius = np.ptp(vor.points, axis=0).max() * 2

    center = vor.points.mean(axis=0)
    new_vertices = vor.vertices.tolist()

    # map ridge -> (points, vertices)
    all_ridges: dict[int, list] = {}
    for (p1, p2), (v1, v2) in zip(vor.ridge_points, vor.ridge_vertices):
        all_ridges.setdefault(p1, []).append((p2, v1, v2))
        all_ridges.setdefault(p2, []).append((p1, v1, v2))

    new_regions = []
    for p1, region_idx in enumerate(vor.point_region):
        vertices = vor.regions[region_idx]
        if all(v >= 0 for v in vertices):
            new_regions.append(vertices)
            continue
        # reconstruct: keep finite vertices, extend each infinite ridge
        ridges = all_ridges.get(p1, [])
        new_region = [v for v in vertices if v >= 0]
        for p2, v1, v2 in ridges:
            if v2 < 0:
                v1, v2 = v2, v1
            if v1 >= 0:
                continue  # finite ridge
            tangent = vor.points[p2] - vor.points[p1]
            tangent /= np.linalg.norm(tangent)
            normal = np.array([-tangent[1], tangent[0]])
            midpoint = vor.points[[p1, p2]].mean(axis=0)
            direction = np.sign(np.dot(midpoint - center, normal)) * normal
            far_point = vor.vertices[v2] + direction * radius
            new_region.append(len(new_vertices))
            new_vertices.append(far_point.tolist())
        # order region vertices counterclockwise
        vs = np.asarray([new_vertices[v] for v in new_region])
        angles = np.arctan2(vs[:, 1] - vs[:, 1].mean(), vs[:, 0] - vs[:, 0].mean())
        new_regions.append(list(np.asarray(new_region)[np.argsort(angles)]))

    return new_regions, np.asarray(new_vertices)

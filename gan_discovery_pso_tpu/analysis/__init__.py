from gan_discovery_pso_tpu.analysis.latent import (
    pca_project,
    umap_project,
    get_clustering_algorithm,
    cluster_latents,
    assign_to_clusters,
    mutual_distance,
    pairwise_distances,
    voronoi_finite_polygons,
)
from gan_discovery_pso_tpu.analysis import reporting

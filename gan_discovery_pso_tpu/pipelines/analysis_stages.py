"""Analysis pipeline stages (reference src/training/pso_analysis*.py,
pso_inverter_analysis.py, and src/data/dataset_preparation.py).

All host-side: they consume the particle artifacts written by the discovery
/ inverter / extractor stages and emit plots + summaries.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from gan_discovery_pso_tpu.analysis import (
    assign_to_clusters,
    cluster_latents,
    mutual_distance,
    pairwise_distances,
    pca_project,
    reporting,
    umap_project,
)
from gan_discovery_pso_tpu.pipelines.context import StageContext
from gan_discovery_pso_tpu.pso import (
    load_final_particle_positions,
    load_particle_trajectories,
)



def _seed(ctx) -> int:
    """Config seed with a None-only fallback (seed: 0 is a real seed)."""
    from gan_discovery_pso_tpu.core.config import cfg_default

    return int(cfg_default(ctx.cfg, "seed", 42))

def _stack_classes(interim_dir, classes, kind="iid"):
    """Final positions of every class stacked: ([sum_N, d], labels)."""
    mats, labels = [], []
    for c in classes:
        m = load_final_particle_positions(interim_dir, c, kind)
        mats.append(m)
        labels.append(np.full(len(m), c))
    return np.concatenate(mats, 0), np.concatenate(labels, 0)


def run_pso_analysis(ctx: StageContext, pso_interim_dir, classes=None, kind: str = "iid"):
    """Per-iteration PCA/UMAP projections + GIFs of the swarm trajectories
    (reference pso_analysis.py:92-124)."""
    classes = classes if classes is not None else ctx.data_cfg.iid_classes

    # final-iteration projections across classes
    data, labels = _stack_classes(pso_interim_dir, classes, kind)
    p2 = pca_project(data, 2)
    reporting.plot_scatter_2d(p2, labels, ctx.run.reports_dir / f"pca_{kind}.png",
                              title=f"PCA of {kind} particles")
    u2, method = umap_project(data, 2)
    reporting.plot_scatter_2d(u2, labels, ctx.run.reports_dir / f"umap_{kind}.png",
                              title=f"{method} of {kind} particles")

    # per-iteration GIF for the first class (trajectory evolution)
    traj = load_particle_trajectories(pso_interim_dir, classes[0], kind)
    frames_dir = ctx.run.reports_dir / f"proj_iters_class_{classes[0]}"
    frames_dir.mkdir(parents=True, exist_ok=True)
    from sklearn.decomposition import PCA

    model = PCA(n_components=2).fit(traj.reshape(-1, traj.shape[-1]))
    frames = []
    step = max(1, traj.shape[0] // 20)
    for it in range(0, traj.shape[0], step):
        pts = model.transform(traj[it])
        frames.append(
            reporting.plot_scatter_2d(
                pts, np.zeros(len(pts), int),
                frames_dir / f"iter_{it:03d}.png", title=f"iteration {it}",
            )
        )
    reporting.make_gif(frames, ctx.run.reports_dir / f"pca_iters_class_{classes[0]}.gif")
    return {"pca": p2, "umap": u2, "labels": labels}


def run_pso_analysis_clustering(
    ctx: StageContext, pso_interim_dir, ood_interim_dir=None,
    classes=None, ood_labels=None, algorithm=None, kind: str = "iid",
):
    """Cluster discovered particles; optionally overlay / assign OoD latents
    (reference pso_analysis_clustering.py:174-228,
    pso_inverter_analysis.py:180-210)."""
    classes = classes if classes is not None else ctx.data_cfg.iid_classes
    if algorithm is None:
        algorithm = str(ctx.cfg.trainer_pso_analysis.clustering_algorithm)

    data, labels = _stack_classes(pso_interim_dir, classes, kind)
    cl_labels, centers, model = cluster_latents(data, algorithm, len(classes),
                                                seed=_seed(ctx))
    p2 = pca_project(np.vstack([data, centers]), 2)
    reporting.plot_scatter_2d(
        p2[: len(data)], cl_labels, ctx.run.reports_dir / "clusters.png",
        title=f"{algorithm} clusters", centers=p2[len(data):],
    )
    if data.shape[1] == 2:
        reporting.plot_voronoi(centers, ctx.run.reports_dir / "voronoi.png",
                               title="cluster Voronoi")

    result = {"cluster_labels": cl_labels, "centers": centers}
    if ood_interim_dir is not None and ood_labels:
        ood_data, ood_lab = _stack_classes(ood_interim_dir, ood_labels, "ood")
        assignment = assign_to_clusters(model, ood_data)
        result["ood_assignment"] = assignment
        p_all = pca_project(np.vstack([data, ood_data]), 2)
        reporting.plot_scatter_2d(
            p_all[: len(data)], cl_labels,
            ctx.run.reports_dir / "clusters_with_ood.png",
            title="clusters + OoD", extra=p_all[len(data):],
        )
        import json

        # per-label PER-PARTICLE assignments + counts (a dict keyed by label
        # alone would collapse every particle of a class onto one entry)
        by_label: dict = {}
        for l, a in zip(ood_lab, assignment):
            by_label.setdefault(str(l), []).append(int(a))
        with open(ctx.run.reports_dir / "ood_cluster_assignment.json", "w") as f:
            json.dump({
                lab: {"assignment": asg,
                      "counts": {str(c): asg.count(c) for c in sorted(set(asg))}}
                for lab, asg in by_label.items()
            }, f, indent=2)
    return result


def run_pso_inverter_analysis(
    ctx: StageContext,
    iid_interim_dir,
    ood_interim_dir,
    ood_patient,
    classes=None,
    algorithm=None,
):
    """Per-patient OoD→cluster assignment report (reference
    src/training/pso_inverter_analysis.py:180-210):

    - fit the clustering algorithm on the full-dim IiD discovery particles
      and persist it (`{algorithm}.pkl`, :186-188);
    - predict the cluster of every OoD-patient latent (:205-207) →
      `ood_patient_{p}_cluster_assignment.json` with the per-cluster counts;
    - for each of PCA and UMAP: re-fit the clustering on the 2-D reduced
      IiD data, plot the IiD latent space, then `reducer.transform` the OoD
      latents and plot the overlay (:194-208)."""
    import json
    import pickle

    from gan_discovery_pso_tpu.analysis.latent import make_umap, pca_project

    classes = classes if classes is not None else ctx.data_cfg.iid_classes
    if algorithm is None:
        algorithm = str(ctx.cfg.trainer_pso_analysis.clustering_algorithm)
    seed = _seed(ctx)
    plot_dir = ctx.run.reports_dir / "training_plot"
    plot_dir.mkdir(parents=True, exist_ok=True)

    data, labels = _stack_classes(iid_interim_dir, classes, "iid")
    ood_data, _ = _stack_classes(ood_interim_dir, [ood_patient], "ood")
    # the reference predicts with .astype('double') (:205); sklearn requires
    # fit/predict dtypes to match, so fit on double too
    data = data.astype(np.float64)
    ood_data = ood_data.astype(np.float64)

    # full-dimensional clustering ('no_transformation', :186)
    cl_labels, centers, model = cluster_latents(data, algorithm, len(classes), seed=seed)
    with open(ctx.run.models_dir / f"{algorithm}.pkl", "wb") as f:
        pickle.dump(model, f)
    assignment = assign_to_clusters(model, ood_data)
    counts = {int(c): int((assignment == c).sum()) for c in np.unique(assignment)}
    report = {
        "ood_patient": int(ood_patient),
        "algorithm": algorithm,
        "n_ood_latents": int(len(ood_data)),
        "cluster_assignment": [int(a) for a in assignment],
        "cluster_counts": counts,
        "dominant_cluster": int(max(counts, key=counts.get)),
    }
    with open(
        ctx.run.reports_dir / f"ood_patient_{ood_patient}_cluster_assignment.json", "w"
    ) as f:
        json.dump(report, f, indent=2)

    # reduced-space analyses: pca + umap (:194-208)
    for method in ("pca", "umap"):
        if method == "pca":
            reduced_iid, reducer = pca_project(data, 2, return_model=True)
        else:
            reducer, _tag = make_umap(2, random_state=seed)
            reduced_iid = reducer.fit_transform(data)
        # NB the reference also re-fits the clustering on the reduced data,
        # but only to feed its 'em' ellipsoid plot (:191-193) — dead compute
        # without that plot, so not reproduced
        reporting.plot_scatter_2d(
            reduced_iid, labels, plot_dir / f"latent_space_{method}.png",
            title=f"{method} latent space (iid)",
        )
        reduced_ood = reducer.transform(ood_data)
        reporting.plot_scatter_2d(
            reduced_iid, labels,
            plot_dir / f"latent_space_{method}_ood_{ood_patient}.png",
            title=f"{method} iid + ood patient {ood_patient}",
            extra=reduced_ood,
        )
    return report


def run_pso_analysis_distance(ctx: StageContext, pso_interim_dir, classes=None,
                              kind: str = "iid"):
    """Within-class pairwise and cross-class mutual distance distributions
    (reference pso_analysis_distance.py:169-228)."""
    classes = classes if classes is not None else ctx.data_cfg.iid_classes
    summary = {}
    mats = {c: load_final_particle_positions(pso_interim_dir, c, kind) for c in classes}
    for c in classes:
        d = pairwise_distances(mats[c])
        reporting.plot_distance_histogram(
            d, ctx.run.reports_dir / f"pairwise_class_{c}.png",
            title=f"class {c} pairwise",
        )
        summary[f"within_{c}"] = {"mean": float(d.mean()), "std": float(d.std())}
    for i, a in enumerate(classes):
        for b in classes[i + 1:]:
            d = mutual_distance(mats[a], mats[b])
            summary[f"between_{a}_{b}"] = {"mean": float(d.mean()), "std": float(d.std())}
    import json

    with open(ctx.run.reports_dir / "distance_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def run_claro_preprocess(
    ctx: StageContext,
    slice_ids=None,
    boxes=None,
    patients_info=None,
    limit: int | None = None,
):
    """CLARO CT export stage, end-to-end from config + manifests (reference
    src/data/dataset_preparation.py:78-103 + configs/claro_preprocess.yaml):

    - `patients_info_{dataset}.xlsx` (or .csv) in the interim dir lists the
      slice TIFFs ('image' column);
    - `data.box_file` maps 'img ID' → the `data.box_value` box list;
    - slice ids are the intersection of the two (sorted, like
      np.intersect1d at :87);
    - every slice runs crop→resize→clip→normalize and exports a float32
      TIFF under `interim/stylegan/` for downstream GAN training.

    `slice_ids`/`boxes` override manifest discovery for API use."""
    from gan_discovery_pso_tpu.data import ClipSpec, prepare_patient_dataset
    from gan_discovery_pso_tpu.data.medical import (
        read_box_manifest,
        read_patients_info,
    )

    cfg = ctx.cfg
    clip = cfg.data.get("clip")
    scale = cfg.data.get("scale")
    clip = ClipSpec(float(clip["min"]), float(clip["max"])) if clip else None
    scale = ClipSpec(float(scale["min"]), float(scale["max"])) if scale else None

    box_file = cfg.data.get("box_file")
    if boxes is None and box_file:
        boxes = read_box_manifest(box_file, str(cfg.data.get("box_value", "box")))
    all_ids = None  # patients_info ids, kept for the zero-match diagnostic
    if slice_ids is None:
        if patients_info is None:
            dataset = ctx.data_cfg.dataset
            base = Path(ctx.data_cfg.interim_dir) / dataset
            cands = [base / f"patients_info_{dataset}.xlsx",
                     base / f"patients_info_{dataset}.csv"]
            patients_info = next((p for p in cands if p.exists()), None)
            if patients_info is None:
                raise FileNotFoundError(
                    f"no patients_info manifest under {base} "
                    "(expected patients_info_{dataset}.xlsx/.csv)"
                )
        all_ids = read_patients_info(patients_info)
        if boxes is not None:
            # np.intersect1d semantics (:87): sorted unique intersection
            slice_ids = sorted(set(all_ids) & set(boxes))
        else:
            slice_ids = sorted(set(all_ids))
    if limit is not None:
        slice_ids = list(slice_ids)[:limit]
    if not slice_ids:
        # fail here with the manifests in hand, not in np.stack([]) later
        hint = ""
        if boxes is not None:
            sample_ids = sorted(set(all_ids))[:3] if all_ids is not None else []
            sample_box = sorted(boxes)[:3]
            hint = (f"; patients_info ids look like {sample_ids} vs box "
                    f"'img ID's like {sample_box} — check extensions/"
                    "numeric formatting match")
        src = ("between the patients_info manifest and the box manifest"
               if boxes is not None else
               "from the patients_info manifest (no box manifest configured"
               " — empty 'image' column, or a zero limit?)")
        raise ValueError(f"claro_preprocess matched 0 slices {src}{hint}")
    print(f"[claro_preprocess] {len(slice_ids)} slices")

    stack, meta = prepare_patient_dataset(
        ctx.data_cfg.data_dir, ctx.data_cfg.dataset, slice_ids,
        ctx.data_cfg.image_size, boxes=boxes, clip=clip, scale=scale,
        # reference exports to interim/{dataset}/stylegan (:70-71)
        out_dir=ctx.run.interim_dir / "stylegan",
    )
    np.savez_compressed(ctx.run.interim_dir / "claro_preprocessed.npz",
                        images=stack)
    return stack, meta

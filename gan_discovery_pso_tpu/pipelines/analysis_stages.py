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

def _stack_classes(interim_dirs, classes, kind="iid"):
    """Final positions of every class stacked: ([sum_N, d], labels).

    `interim_dirs` may be one dir or a sequence of dirs searched in order —
    the reference's pso_inverter runs are per-patient (one interim dir each,
    start_pso_optimize.sh:3-16), so an OoD overlay across patients spans
    several run dirs."""
    from pathlib import Path

    if isinstance(interim_dirs, (str, Path)):
        interim_dirs = [interim_dirs]
    mats, labels = [], []
    for c in classes:
        errs = []
        for d in interim_dirs:
            try:
                m = load_final_particle_positions(d, c, kind)
                break
            except FileNotFoundError as e:
                errs.append(e)
        else:
            raise FileNotFoundError(
                f"no {kind} particle artifact for class {c} in any of "
                f"{[str(d) for d in interim_dirs]} — for OoD overlays, pass "
                "one --path-ood-pso per inverted patient"
            ) from errs[-1]
        mats.append(m)
        labels.append(np.full(len(m), c))
    return np.concatenate(mats, 0), np.concatenate(labels, 0)


def run_pso_analysis(ctx: StageContext, pso_interim_dir, classes=None,
                     kind: str = "iid", iter_step: int = 1):
    """Per-iteration PCA/UMAP projections of the cross-class swarm state
    (reference pso_analysis.py:92-124): for every recorded iteration, stack
    ALL classes' particle positions at that iteration (a class whose swarm
    stopped early contributes its last recorded row, :104-110) and emit

    - `training_plot/pca_space_{i}.png` + `pca_variance_plot_{i}.png`
      (pca_fun, util_latent_analysis.py:16-43),
    - `training_plot/umap_space_{i}.png` (umap_fun, :45-64),

    then assemble `training_plot/pca_space.gif` (:124). `iter_step`
    subsamples iterations (the reference projects every one; UMAP per
    iteration is the expensive part).

    Also emits final-iteration summary scatters `pca_{kind}.png` /
    `umap_{kind}.png` at the reports root (framework extra)."""
    classes = classes if classes is not None else ctx.data_cfg.iid_classes
    plot_dir = ctx.run.reports_dir / "training_plot"
    plot_dir.mkdir(parents=True, exist_ok=True)

    trajs = {c: load_particle_trajectories(pso_interim_dir, c, kind)
             for c in classes}
    n_iters = max(t.shape[0] for t in trajs.values())

    pca_frames = []
    for i in range(0, n_iters, max(1, int(iter_step))):
        rows, labs = [], []
        for c in classes:
            t = trajs[c]
            rows.append(t[min(i, t.shape[0] - 1)])
            labs.append(np.full(rows[-1].shape[0], c))
        data_i = np.concatenate(rows, 0)
        labs_i = np.concatenate(labs, 0)
        p_i, pca_model = pca_project(data_i, min(data_i.shape), return_model=True)
        reporting.plot_pca_variance(
            pca_model.explained_variance_,
            plot_dir / f"pca_variance_plot_{i}.png",
        )
        pca_frames.append(reporting.plot_scatter_2d(
            p_i[:, :2], labs_i, plot_dir / f"pca_space_{i}.png",
            title="PCA projection of latent space (iid class)",
        ))
        u_i, method = umap_project(data_i, 2)
        reporting.plot_scatter_2d(
            u_i, labs_i, plot_dir / f"umap_space_{i}.png",
            title=f"{method} projection of latent space (iid class)",
        )
    reporting.make_gif(pca_frames, plot_dir / "pca_space.gif")

    # final-iteration projections across classes (framework summary)
    data, labels = _stack_classes(pso_interim_dir, classes, kind)
    p2 = pca_project(data, 2)
    reporting.plot_scatter_2d(p2, labels, ctx.run.reports_dir / f"pca_{kind}.png",
                              title=f"PCA of {kind} particles")
    u2, method = umap_project(data, 2)
    reporting.plot_scatter_2d(u2, labels, ctx.run.reports_dir / f"umap_{kind}.png",
                              title=f"{method} of {kind} particles")
    ctx.run.write_timing({})  # (reference pso_analysis.py:127-132)
    # pso_analysis.py:131-132 also dumps overall_history (empty in the
    # reference — never populated); we store the computed projections
    summary = {"pca": p2, "umap": u2, "labels": labels}
    ctx.run.write_overall_history(summary)
    return summary


def run_pso_analysis_clustering(
    ctx: StageContext, pso_interim_dir, ood_interim_dir=None,
    classes=None, ood_labels=None, algorithm=None, kind: str = "iid",
    overlay_kind: str = "ood",
):
    """Cluster discovered particles; optionally overlay / assign OoD (or
    inverted-IiD) latents (reference pso_analysis_clustering.py:174-228).

    Reference artifact set:
    - `models/{algorithm}.pkl` — the full-dimensional fitted model (:181-182);
    - dim_space == 2: `training_plot/latent_space.png` (:183), plus
      `training_plot/ellipsoid_Gaussian Mixture.png` for `em` (:184);
    - per dim-reduction in (pca, umap): re-fit the clustering on the 2-D
      reduced data (kmeans_fun/em_fun, :186-193) →
      `training_plot/latent_space_{alg}.png` (+ `ellipsoid_{alg}.png` for em);
    - per overlay label (`overlay_kind`='ood' or 'iid' ≡ the reference's
      `ood_analysis` switch, :195-228): full-dim 2-D overlay
      `latent_space_ood_{label}.png` and reduced overlay
      `latent_space_{alg}_ood_{label}.png` (reducer.transform on the
      overlay latents), capped at 1000 points like plot_latent_space (:193).

    `clusters.png` / `voronoi.png` / `clusters_with_ood.png` +
    `ood_cluster_assignment.json` are kept as framework extras."""
    classes = classes if classes is not None else ctx.data_cfg.iid_classes
    if algorithm is None:
        algorithm = str(ctx.cfg.trainer_pso_analysis.clustering_algorithm)
    seed = _seed(ctx)
    plot_dir = ctx.run.reports_dir / "training_plot"
    plot_dir.mkdir(parents=True, exist_ok=True)

    data, labels = _stack_classes(pso_interim_dir, classes, kind)
    data = data.astype(np.float64)
    cl_labels, centers, model = cluster_latents(data, algorithm, len(classes),
                                                seed=seed)
    import pickle

    with open(ctx.run.models_dir / f"{algorithm}.pkl", "wb") as f:
        pickle.dump(model, f)

    if data.shape[1] == 2:
        reporting.plot_scatter_2d(data, labels, plot_dir / "latent_space.png",
                                  title="Latent Space")
        if algorithm == "em":
            reporting.plot_ellipsoids(
                data, model.predict(data), model.means_, model.covariances_,
                plot_dir / "ellipsoid_Gaussian Mixture.png",
                dim_red_algorithm="Gaussian Mixture",
            )

    # overlay latents (reference :195-228: 'ood' → inverter particles,
    # 'iid' → inverted-iid extractor particles)
    ood_data = ood_lab = None
    if ood_interim_dir is not None and ood_labels:
        ood_data, ood_lab = _stack_classes(ood_interim_dir, ood_labels,
                                           overlay_kind)
        ood_data = ood_data.astype(np.float64)

    from gan_discovery_pso_tpu.analysis.latent import make_umap

    for dim_red in ("pca", "umap"):
        if dim_red == "pca":
            reduced, reducer = pca_project(data, 2, return_model=True)
        else:
            reducer, _ = make_umap(2, random_state=seed)
            reduced = reducer.fit_transform(data)
        red_labels, _red_centers, red_model = cluster_latents(
            reduced, algorithm, len(classes), seed=seed)
        reporting.plot_scatter_2d(
            reduced, labels, plot_dir / f"latent_space_{dim_red}.png",
            title=f"{dim_red} Latent Space",
        )
        if algorithm == "em":
            reporting.plot_ellipsoids(
                reduced, red_model.predict(reduced), red_model.means_,
                red_model.covariances_, plot_dir / f"ellipsoid_{dim_red}.png",
                dim_red_algorithm=dim_red,
            )
        if ood_data is not None:
            for label in ood_labels:
                sel = ood_data[ood_lab == label][:1000]
                if dim_red == "pca" and data.shape[1] == 2:
                    reporting.plot_scatter_2d(
                        data, labels,
                        plot_dir / f"latent_space_ood_{label}.png",
                        title="Latent Space", extra=sel,
                    )
                reporting.plot_scatter_2d(
                    reduced, labels,
                    plot_dir / f"latent_space_{dim_red}_ood_{label}.png",
                    title=f"{dim_red} Latent Space",
                    extra=reducer.transform(sel),
                )

    # ---- framework extras (round-1 contract) ----
    p2 = pca_project(np.vstack([data, centers]), 2)
    reporting.plot_scatter_2d(
        p2[: len(data)], cl_labels, ctx.run.reports_dir / "clusters.png",
        title=f"{algorithm} clusters", centers=p2[len(data):],
    )
    if data.shape[1] == 2 and len(centers) >= 4:  # Qhull needs ≥ d+2 points
        reporting.plot_voronoi(centers, ctx.run.reports_dir / "voronoi.png",
                               title="cluster Voronoi")

    result = {"cluster_labels": cl_labels, "centers": centers}
    if ood_data is not None:
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
    if data.shape[1] == 2 and algorithm == "em":
        # full-dim GMM component ellipses (:190-192)
        reporting.plot_ellipsoids(
            data, model.predict(data), model.means_, model.covariances_,
            plot_dir / "ellipsoid_Gaussian Mixture.png",
            dim_red_algorithm="Gaussian Mixture",
        )
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
    general = ctx.run.reports_dir / "general"
    general.mkdir(parents=True, exist_ok=True)
    summary = {}
    curves: dict = {}
    mats = {c: load_final_particle_positions(pso_interim_dir, c, kind) for c in classes}
    for c in classes:
        # the reference caps each class at 250 latents (:191-192)
        d = pairwise_distances(mats[c][:250])
        reporting.plot_distance_histogram(
            d, ctx.run.reports_dir / f"pairwise_class_{c}.png",
            title=f"class {c} pairwise",
        )
        curves[str(c)] = d
        summary[f"within_{c}"] = {"mean": float(d.mean()), "std": float(d.std())}
    for i, a in enumerate(classes):
        for b in classes[i + 1:]:
            d = mutual_distance(mats[a][:250], mats[b][:250])
            if i == 0 and b == classes[1]:
                # the reference's single 'mutual' curve pairs the first two
                # classes (:174-176)
                curves["mutual"] = d
            summary[f"between_{a}_{b}"] = {"mean": float(d.mean()), "std": float(d.std())}
    # reference figure pair (:225-226) — filename typo included
    reporting.plot_sorted_distance_curves(curves, general / "paiwise_mse.png")
    reporting.plot_distance_kde(curves, general / "latent_kde_distribution.png")
    import json

    with open(ctx.run.reports_dir / "distance_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    ctx.run.write_timing({})  # (reference pso_analysis_distance.py:229-234)
    ctx.run.write_overall_history(summary)
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

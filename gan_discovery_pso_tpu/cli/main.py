"""Command-line entry point: one subcommand per pipeline stage.

Replaces the reference's 15 standalone scripts + bash sweep drivers
(reference src/training/*.py, src/bash/start.sh:11-36,
start_pso_optimize.sh:3-16) with a single CLI:

    python -m gan_discovery_pso_tpu.cli <stage> --cfg configs/dcgan_mnist.yaml
        [--set key=value ...] [--path-<upstream> DIR ...]

Stages: cae, classifiers, dcgan, cnn, cnn-multipatient, pso-discovery,
inverter, iid-extract, ood-extract, pso-inverter, regularize-inverter,
regularize-inverter-statistics, vqvae, pso-analysis,
pso-analysis-clustering, pso-analysis-distance, pso-inverter-analysis,
claro-preprocess, sweep.

`sweep` runs the reference's latent-dim sweep (start.sh:11: dims
{2,3,4,6,8,10,20,30,100}) or a per-patient sweep sequentially; each leg is
an independent run dir.

No interactivity anywhere (the reference's input() debug gates are gone,
SURVEY.md §5.6).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _parse_set(values):
    """--set a.b.c=value (int/float/bool/list auto-coerced via yaml)."""
    import yaml

    out = {}
    for item in values or []:
        k, _, v = item.partition("=")
        out[k] = yaml.safe_load(v)
    return out


def _add_common(p):
    p.add_argument("--cfg", default="configs/dcgan_mnist.yaml")
    # action="extend" so repeated `--set a=1 --set b=2` accumulates instead of
    # the default nargs="*" store behavior silently keeping only the last flag
    p.add_argument("--set", nargs="*", action="extend", default=[],
                   help="dotted config overrides (repeatable)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny-config smoke run (small models, capped data)")
    p.add_argument("--limit", type=int, default=None, help="cap images per dataset")
    p.add_argument("--fast-math", action="store_true",
                   help="trace model convs/matmuls at DEFAULT precision "
                        "(MXU bf16 passes) instead of the fp32-parity "
                        "HIGHEST default — the production-throughput mode")


_TINY = {
    "model_gan.network.units_gen": 8,
    "model_gan.network.units_disc": 8,
    "trainer_gan.z_dim": 8,
    "trainer_pso.n_iterations": 4,
    "trainer_pso.n_particles": 8,
    "trainer_pso.dim_space": 8,
    "model_inverter.latent_space": 8,
    "model_ae.latent_space": 6,
    # vqvae.yaml: the codebook dim must track the (tiny) PSO dim_space and
    # the frozen generator's z_dim, and 8 particles x 8 classes only yields
    # 64 codebook rows
    "model.latent_space.embedding_dim": 8,
    "model.latent_space.num_embedding": 64,
}


def _ctx(args, module):
    from gan_discovery_pso_tpu.pipelines import StageContext

    overrides = _parse_set(args.set)
    if args.tiny:
        overrides = {**_TINY, **overrides}
    ctx = StageContext.create(args.cfg, module, overrides=overrides,
                              run_id=getattr(args, "resume_id", None))
    if args.limit or args.tiny:
        ctx.limit = args.limit or 512
    return ctx


def _epochs(args):
    return 1 if args.tiny and args.epochs is None else args.epochs


def main(argv=None):
    parser = argparse.ArgumentParser(prog="gan-discovery-pso-tpu")
    sub = parser.add_subparsers(dest="stage", required=True)

    for name in (
        "cae", "classifiers", "dcgan", "cnn", "cnn-multipatient", "pso-discovery",
        "inverter", "iid-extract", "ood-extract", "pso-inverter",
        "regularize-inverter", "regularize-inverter-statistics", "vqvae",
        "pixelcnn-prior",
        "pso-analysis", "pso-analysis-clustering", "pso-analysis-distance",
        "pso-inverter-analysis", "claro-preprocess", "sweep",
    ):
        p = sub.add_parser(name)
        _add_common(p)
        p.add_argument("--epochs", type=int, default=None)
        p.add_argument("--path-cae", default=None, help="cae stage model dir")
        p.add_argument("--path-classifiers", default=None)
        p.add_argument("--path-gan", default=None, help="dcgan stage model dir")
        p.add_argument("--path-cnn", default=None, help="cnn stage model dir")
        p.add_argument("--path-inverter", default=None)
        p.add_argument("--path-pso", default=None, help="pso_discovery interim dir")
        p.add_argument("--path-ood-pso", action="append", default=None,
                       help="pso_inverter interim dir; repeatable — the "
                            "reference's inverter runs are per-patient, so "
                            "a multi-patient OoD overlay needs one dir per "
                            "inverted patient")
        p.add_argument("--path-vqvae", default=None, help="vqvae stage model dir")
        if name in ("pso-inverter", "pso-inverter-analysis"):
            p.add_argument("--ood-patient", type=int, default=None)
        if name == "dcgan":
            # ≡ the reference's `-i/--id_exp` resume handle (dcgan.py:26-39):
            # re-enter run dir NNNNN--dcgan and continue from its checkpoint
            p.add_argument("--resume-id", type=int, default=None, metavar="N",
                           help="re-enter run dir N and resume from its "
                                "checkpoint; --epochs counts ADDITIONAL epochs")
        if name == "pso-discovery":
            p.add_argument("--batch-classes", action="store_true",
                           help="advance all class swarms in one vmapped program")
            p.add_argument("--shard-swarm", type=int, default=None, metavar="N",
                           help="shard particles over an N-device mesh")
        if name == "sweep":
            p.add_argument("--latent-dims", type=int, nargs="*",
                           default=[2, 3, 4, 6, 8, 10, 20, 30, 100])
            p.add_argument("--stages", nargs="*", default=["dcgan", "pso-discovery"])
            # per-patient sweep ≡ reference start_pso_optimize.sh:3-16
            p.add_argument("--patients", type=int, nargs="*", default=None)
            p.add_argument("--controls", nargs="*",
                           default=["optimize_in_training", "optimize_out_training"])

    # AOT serving-artifact export (StableHLO via jax.export)
    pe = sub.add_parser("export-model",
                        help="export a self-contained StableHLO serving "
                             "artifact (weights baked in)")
    _add_common(pe)
    pe.add_argument("what", choices=["generator", "fitness"])
    pe.add_argument("out", help="output artifact path")
    pe.add_argument("--path-gan", required=True)
    pe.add_argument("--path-cnn", default=None,
                    help="required for `fitness` (assessor models dir)")
    pe.add_argument("--batch", type=int, default=32)
    pe.add_argument("--class-label", type=int, default=None,
                    help="fitness: the IiD class label to score (default: "
                         "first iid class)")
    pe.add_argument("--platforms", nargs="*", default=None,
                    help="cross-platform lowering targets, e.g. tpu cpu")

    # torch-checkpoint migration (no StageContext needed)
    pc = sub.add_parser("convert-torch",
                        help="import a reference PyTorch checkpoint")
    pc.add_argument("src", help=".pt / .tar checkpoint from the reference")
    pc.add_argument("model", choices=[
        "generator", "discriminator", "encoder", "cae_encoder",
        "cae_decoder", "resnet50", "resnet101", "resnet152"])
    pc.add_argument("dst", help="output .msgpack path")

    # the reverse leg: framework checkpoint → reference-loadable torch file
    px = sub.add_parser("export-torch",
                        help="export a framework checkpoint to a reference "
                             "PyTorch state dict (.pt) or .tar container")
    px.add_argument("src", help="framework .msgpack checkpoint "
                                "(state-dict save or GAN checkpoint)")
    px.add_argument("model", choices=[
        "generator", "discriminator", "encoder", "cae_encoder",
        "cae_decoder", "resnet50", "resnet101", "resnet152"])
    px.add_argument("dst", help="output path; .tar wraps the reference's "
                                "{'epoch','model_state_dict','loss'} dict, "
                                "anything else saves the bare state_dict")
    px.add_argument("--epoch", type=int, default=0,
                    help=".tar epoch field (GAN checkpoints supply their own)")
    px.add_argument("--loss", type=float, default=0.0,
                    help=".tar loss field (GAN checkpoints supply their own)")

    args = parser.parse_args(argv)
    if args.stage == "export-model":
        return _export_model(args)
    if args.stage == "convert-torch":
        from gan_discovery_pso_tpu.compat.torch_import import convert_torch_checkpoint

        convert_torch_checkpoint(args.src, args.model, dst=args.dst)
        print(f"[convert-torch] {args.src} ({args.model}) -> {args.dst}")
        return 0
    if args.stage == "export-torch":
        from gan_discovery_pso_tpu.compat.torch_export import export_torch_checkpoint

        export_torch_checkpoint(args.src, args.model, args.dst,
                                epoch=args.epoch, loss=args.loss)
        print(f"[export-torch] {args.src} ({args.model}) -> {args.dst}")
        return 0
    return dispatch(args)


def _export_model(args):
    """`export-model {generator,fitness} OUT` — serialize a self-contained
    StableHLO serving artifact (compat/export.py). No run dir is created."""
    from gan_discovery_pso_tpu.compat.export import (
        export_discovery_fitness,
        export_generator,
    )
    from gan_discovery_pso_tpu.core.config import DataConfig, load_config
    from gan_discovery_pso_tpu.pipelines import load_gan

    overrides = _parse_set(args.set)
    if args.tiny:
        # honor --tiny like every run-dir stage does (_ctx): exporting from
        # a tiny-run checkpoint must trace tiny shapes, not full-width ones
        overrides = {**_TINY, **overrides}
    cfg = load_config(args.cfg, overrides=overrides)
    data_cfg = DataConfig.from_config(cfg.data)
    gp, gs = load_gan(args.path_gan)
    platforms = tuple(args.platforms) if args.platforms else None
    import contextlib

    from gan_discovery_pso_tpu.ops.precision import fast_math

    # --fast-math is trace-time: the export lowers inside the context, so
    # the artifact itself carries DEFAULT conv/matmul precision
    prec_ctx = fast_math() if getattr(args, "fast_math", False) else contextlib.nullcontext()
    with prec_ctx:
        if args.what == "generator":
            out = export_generator(
                gp, gs, z_dim=int(cfg.trainer_gan.z_dim), batch=args.batch,
                path=args.out, platforms=platforms,
            )
        else:
            from gan_discovery_pso_tpu.pipelines import load_cnn
            from gan_discovery_pso_tpu.pipelines.stages import assessor_factory

            iid = tuple(data_cfg.iid_classes)
            rdef, _i, _a = assessor_factory(cfg, data_cfg, len(iid))
            cp, cs = load_cnn(
                _require(args.path_cnn, "--path-cnn",
                         "models dir of a cnn-multipatient run"), rdef)
            label = args.class_label if args.class_label is not None else iid[0]
            c2i = rdef.class_to_idx()
            if label not in c2i:
                sys.exit(
                    f"export-model: --class-label {label} is not an IiD class "
                    f"of this config (classes: {sorted(c2i)}) — the exported "
                    "fitness would score the wrong logit column"
                )
            out = export_discovery_fitness(
                gp, gs, cp, cs, rdef,
                class_idx=c2i[label],
                dim_space=int(cfg.trainer_pso.dim_space), batch=args.batch,
                path=args.out, platforms=platforms,
            )
    print(f"[export-model] {args.what} -> {out}")
    return 0


def _require(value, flag: str, hint: str):
    """Exit with a usage message (not a TypeError traceback) when a
    prerequisite-artifact flag is missing."""
    if not value:
        sys.exit(f"{flag} required ({hint})")
    return value


def _load_gan(args):
    from gan_discovery_pso_tpu.pipelines import load_gan

    if not args.path_gan:
        sys.exit("--path-gan required (models dir of a dcgan run)")
    return load_gan(args.path_gan)


def _load_cnn(args, ctx):
    from gan_discovery_pso_tpu.pipelines import load_cnn
    from gan_discovery_pso_tpu.pipelines.stages import _assessor

    if not args.path_cnn:
        sys.exit("--path-cnn required (models dir of a cnn-multipatient run)")
    iid = tuple(ctx.data_cfg.iid_classes)
    # same factory as the training stages (reference get_cnn indirection) —
    # a model_cnn.model_name of AlexNet resolves to an AlexNetDef here too
    rdef, _init, _apply = _assessor(ctx, len(iid))
    params, state = load_cnn(args.path_cnn, rdef)
    return params, state, rdef


def _stage_lock(name: str):
    """One TPU holder at a time, as a mechanism (core/tpulock.py): every
    device-using stage takes the host-local lease before first jax use, so a
    stage can never time-slice the chip under a running bench or sweep leg
    (the round-4 contention post-mortem, docs/BENCH.md). No-op when JAX is
    pinned to CPU (tests) or GDPT_NO_TPU_LOCK=1."""
    from gan_discovery_pso_tpu.core.tpulock import tpu_lock

    return tpu_lock(f"cli:{name}")


def dispatch(args):
    stage = args.stage

    if stage == "sweep":
        if getattr(args, "patients", None):
            # per-patient × control sweep ≡ reference start_pso_optimize.sh:3-16
            for patient in args.patients:
                for control in args.controls:
                    leg_args = argparse.Namespace(**vars(args))
                    leg_args.stage = "pso-inverter"
                    leg_args.ood_patient = patient
                    leg_args.set = list(args.set) + [
                        f"pso_inverter.ood_patient={patient}",
                        f"trainer_pso_inverter.control_pso_fitness={control}",
                    ]
                    print(f"[sweep] patient={patient} control={control}")
                    dispatch(leg_args)
            return 0
        # latent-dim sweep ≡ reference start.sh:11-36
        for dim in args.latent_dims:
            for leg in args.stages:
                leg_args = argparse.Namespace(**vars(args))
                leg_args.stage = leg
                leg_args.set = list(args.set) + [
                    f"trainer_gan.z_dim={dim}",
                    f"trainer_pso.dim_space={dim}",
                    f"model_inverter.latent_space={dim}",
                ]
                print(f"[sweep] latent_dim={dim} stage={leg}")
                dispatch(leg_args)
        return 0

    from gan_discovery_pso_tpu import pipelines as P

    module = stage.replace("-", "_")
    ctx = _ctx(args, module)
    # --fast-math covers the whole stage: jitted steps trace on their first
    # call inside this block, baking DEFAULT conv/matmul precision in
    # (ops/precision.py). Besides MXU throughput, this sidesteps an XLA:TPU
    # pathology where HIGHEST-precision conv WEIGHT-gradients of some shapes
    # (e.g. AlexNet's 3x3/s1/p1 on 28x28) compile for tens of minutes.
    import contextlib

    from gan_discovery_pso_tpu.ops.precision import fast_math

    fm = fast_math() if getattr(args, "fast_math", False) else contextlib.nullcontext()
    with _stage_lock(stage), ctx.tee(), fm:
        if stage == "cae":
            P.run_cae(ctx, epochs=_epochs(args))
        elif stage == "classifiers":
            P.run_classifiers(ctx, cae_model_dir=_require(
                args.path_cae, "--path-cae", "models dir of a cae run"))
        elif stage == "dcgan":
            cae_state = P.load_cae(_require(
                args.path_cae, "--path-cae", "models dir of a cae run"))
            from gan_discovery_pso_tpu.evaluation import load_battery

            battery = load_battery(Path(_require(
                args.path_classifiers, "--path-classifiers",
                "models dir of a classifiers run")) / "classifiers.msgpack")
            P.run_dcgan(ctx, cae_state, battery, epochs=_epochs(args),
                        n_synthetic=256 if args.tiny else None,
                        resume=args.resume_id is not None)
        elif stage == "cnn":
            P.run_cnn(ctx, epochs=_epochs(args))
        elif stage == "cnn-multipatient":
            P.run_cnn_multipatient(ctx, epochs=_epochs(args))
        elif stage == "pso-discovery":
            gp, gs = _load_gan(args)
            cp, cs, rdef = _load_cnn(args, ctx)
            # --shard-swarm goes through the SAME pipeline (full artifact
            # contract: timing.json, pickles, plots, image grids)
            P.run_pso_discovery(ctx, gp, gs, cp, cs, rdef,
                                batch_classes=getattr(args, "batch_classes", False),
                                shard_devices=getattr(args, "shard_swarm", None))
        elif stage == "inverter":
            gp, gs = _load_gan(args)
            cnn = None
            if str(ctx.cfg.trainer_inverter.training_function) == "pix_fea_rec_adv":
                cnn = _load_cnn(args, ctx)
            P.run_inverter(ctx, gp, gs, cnn=cnn, epochs=_epochs(args))
        elif stage in ("iid-extract", "ood-extract"):
            enc = P.load_encoder(_require(args.path_inverter, "--path-inverter", "models dir of an inverter run"))
            # the reference extractor also loads G and writes per-class
            # G(E(x)) superimages (iid_extractor.py:163-199); optional here
            gen = _load_gan(args) if getattr(args, "path_gan", None) else None
            P.run_extractor(ctx, enc, kind=stage.split("-")[0], gen=gen)
        elif stage == "pso-inverter":
            gp, gs = _load_gan(args)
            enc = P.load_encoder(_require(args.path_inverter, "--path-inverter", "models dir of an inverter run"))
            cp, cs, rdef = _load_cnn(args, ctx)
            P.run_pso_inverter(ctx, gp, gs, enc, cp, cs, rdef,
                               ood_patient=getattr(args, "ood_patient", None),
                               fine_tune_epochs=_epochs(args))
        elif stage == "regularize-inverter":
            gp, gs = _load_gan(args)
            enc = P.load_encoder(_require(args.path_inverter, "--path-inverter", "models dir of an inverter run"))
            ds = ctx.dataset("test", classes=ctx.data_cfg.ood_classes,
                             drange=(-1, 1))
            P.run_regularize_inverter(ctx, gp, gs, enc, ds.images[:8],
                                      iterations=50 if args.tiny else 500,
                                      labels=np.asarray(ds.labels)[:8])
        elif stage == "regularize-inverter-statistics":
            gp, gs = _load_gan(args)
            enc = P.load_encoder(_require(args.path_inverter, "--path-inverter", "models dir of an inverter run"))
            ds = ctx.dataset("test", classes=ctx.data_cfg.ood_classes,
                             drange=(-1, 1))
            P.run_regularize_inverter_statistics(
                ctx, gp, gs, enc, ds.images[:8], pso_interim_dir=args.path_pso,
                iterations=50 if args.tiny else 500,
                labels=np.asarray(ds.labels)[:8])
        elif stage == "vqvae":
            gp, gs = _load_gan(args)
            P.run_vqvae(ctx, gp, gs, pso_interim_dir=args.path_pso,
                        epochs=_epochs(args))
        elif stage == "pixelcnn-prior":
            P.run_pixelcnn_prior_from_vqvae(
                ctx,
                _require(args.path_vqvae, "--path-vqvae",
                         "models dir of a vqvae run"),
                epochs=_epochs(args))
        elif stage == "pso-analysis":
            P.run_pso_analysis(ctx, _require(args.path_pso, "--path-pso", "interim dir of a pso-discovery run"))
        elif stage == "pso-analysis-clustering":
            P.run_pso_analysis_clustering(
                ctx,
                _require(args.path_pso, "--path-pso",
                         "interim dir of a pso-discovery run"),
                ood_interim_dir=args.path_ood_pso,
                ood_labels=tuple(ctx.data_cfg.ood_classes) if args.path_ood_pso else None)
        elif stage == "pso-analysis-distance":
            P.run_pso_analysis_distance(ctx, _require(args.path_pso, "--path-pso", "interim dir of a pso-discovery run"))
        elif stage == "pso-inverter-analysis":
            if args.path_pso is None or args.path_ood_pso is None:
                sys.exit("--path-pso (iid discovery interim) and "
                         "--path-ood-pso (pso-inverter interim) required")
            ood_patient = getattr(args, "ood_patient", None)
            if ood_patient is None:
                ood_patient = int(ctx.cfg.pso_inverter.ood_patient)
            P.run_pso_inverter_analysis(
                ctx, args.path_pso, list(args.path_ood_pso), ood_patient)
        elif stage == "claro-preprocess":
            # end-to-end from config + manifests (reference
            # src/data/dataset_preparation.py:78-103); --tiny caps slices
            P.run_claro_preprocess(ctx, limit=ctx.limit)
        else:
            sys.exit(f"unknown stage {stage}")
    print(f"[{stage}] done → {ctx.run.reports_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Pipeline stages: cae, classifiers, dcgan, cnn(±multipatient), inverter,
extractors, pso_inverter, regularize_inverter(±statistics), vqvae.

One function per reference entry script (reference src/training/*.py),
consuming a StageContext and upstream artifacts, producing the reference's
artifact contract into the stage's run dirs. Execution order follows
reference readme_cnr.txt:46-87:

    cae → classifiers → dcgan → cnn/cnn_multipatient → pso_discovery →
    inverter → iid/ood_extractor → pso_inverter →
    regularize_inverter(_statistics) → vq_vae → analyses
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gan_discovery_pso_tpu.analysis import reporting
from gan_discovery_pso_tpu.core import jit_init
from gan_discovery_pso_tpu.core.checkpoint import save_pytree
from gan_discovery_pso_tpu.core.config import AdamConfig, PsoConfig, cfg_default
from gan_discovery_pso_tpu.data import train_val_split
from gan_discovery_pso_tpu.evaluation import (
    evaluate_gan_epoch,
    save_battery,
    train_classifier_battery,
)
from gan_discovery_pso_tpu.models import (
    CAEDef,
    DiscriminatorDef,
    EncoderDef,
    GeneratorDef,
    ResNetDef,
    VQVAEGanDef,
    encoder_init,
)
from gan_discovery_pso_tpu.models.encoder import encoder_apply
from gan_discovery_pso_tpu.pipelines.context import StageContext
from gan_discovery_pso_tpu.pso import (
    OPTIMIZE_IN,
    SwarmResult,
    optimize,
    save_particle_histories,
    load_final_particle_positions,
)
from gan_discovery_pso_tpu.train import (
    gan_init,
    invert,
    invert_bn,
    make_gan_train_step,
    make_pix_fea_rec_adv_step,
    make_pix_rec_step,
    make_sampler,
    train_cnn,
    train_vqvae,
    vqvae_init,
)
from gan_discovery_pso_tpu.train.cae import encode_dataset, save_encoded_samples_csv
from gan_discovery_pso_tpu.train.common import make_optimizer
from gan_discovery_pso_tpu.train.inverter import PixFeaRecAdvState, PixRecState


# ---------------------------------------------------------------------------
# CAE stage (reference src/training/cae.py)
# ---------------------------------------------------------------------------


def run_cae(ctx: StageContext, epochs: int | None = None):
    cfg = ctx.cfg
    d = CAEDef(latent_dim=int(cfg.model_ae.latent_space))
    adam = AdamConfig.from_config(cfg.trainer_ae.optimizer)
    bs = int(cfg.trainer_ae.batch_size)
    epochs = epochs if epochs is not None else int(cfg.trainer_ae.epochs)
    task = str(cfg.model_ae.task)
    noise_factor = float(cfg_default(cfg.model_ae, "noise_factor", 0.3))  # 0.0 is valid

    ds = ctx.dataset("train", drange=(0, 1))
    val = ctx.dataset("test", drange=(0, 1))

    from gan_discovery_pso_tpu.train.cae import train_cae

    state, history = train_cae(
        ctx.keys("cae"), d, adam,
        ctx.batches(ds, bs), ctx.batches(val, bs, drop_last=False),
        num_epochs=epochs, task=task, noise_factor=noise_factor,
        metrics_writer=ctx.metrics("history_cae"),
    )
    # artifact contract: encoder.pt/decoder.pt (reference cae.py:205-206)
    ctx.ckpt.save_state_dict("encoder", {"params": state.enc_params, "state": state.enc_state})
    ctx.ckpt.save_state_dict("decoder", {"params": state.dec_params, "state": state.dec_state})
    # encoded_samples_{train,valid}.csv (reference cae.py:214-218)
    emb = encode_dataset(state, ds.images)
    save_encoded_samples_csv(
        ctx.run.interim_dir / "encoded_samples_train.csv", emb, np.asarray(ds.labels)
    )
    emb_val = encode_dataset(state, val.images)
    save_encoded_samples_csv(
        ctx.run.interim_dir / "encoded_samples_valid.csv", emb_val, np.asarray(val.labels)
    )
    if d.latent_dim == 2:
        # 2-D latent visualizations (reference cae.py:218-221): decoder
        # sweep over the latent box + labelled train/valid scatters
        from gan_discovery_pso_tpu.models.cae import cae_decoder_apply

        decode = jax.jit(lambda z: cae_decoder_apply(
            state.dec_params, state.dec_state, z)[0])
        reporting.plot_img_latent_space(
            decode, ctx.run.general_dir, w=int(cfg.data.image_size))
        reporting.plot_latent_space(emb, np.asarray(ds.labels),
                                    ctx.run.general_dir, dataset="Training")
        reporting.plot_latent_space(emb_val, np.asarray(val.labels),
                                    ctx.run.general_dir, dataset="Validation")
    reporting.plot_training_curves(history, ctx.run.reports_dir / "cae_training.png")
    # reference layout: training_plot/train_val_loss.png via the generic
    # plot_training (cae.py:211 → util_report.py:146-158)
    reporting.plot_cnn_training(history, ctx.run.plot_dir)
    # img_loss.png recon panel (reference util_cae.py:221/278, rewritten
    # every eval epoch — the final-state panel is the surviving artifact):
    # denoise task → original/noisy/denoised 3-row, reconstruct → 2-row
    from gan_discovery_pso_tpu.models.cae import (
        add_noise,
        cae_decoder_apply,
        cae_encoder_apply,
    )

    def _cae_rec(x):
        z, _ = cae_encoder_apply(state.enc_params, state.enc_state, x, train=False)
        rec, _ = cae_decoder_apply(state.dec_params, state.dec_state, z, train=False)
        return np.asarray(rec)

    vis = val.images[:10]
    if task == "denoising":
        noisy = add_noise(ctx.keys("cae_img_loss"), vis, noise_factor)
        reporting.denoise_panel(vis, np.asarray(noisy), _cae_rec(noisy),
                                ctx.run.general_dir / "img_loss.png")
    else:
        reporting.recon_panel(vis, _cae_rec(vis),
                              ctx.run.general_dir / "img_loss.png")
    # timing + history pickles every reference entry writes at exit
    # (cae.py:226-231)
    ctx.run.write_timing({})
    ctx.run.write_overall_history(history)
    return state, history


def load_cae(model_dir: str | Path):
    from gan_discovery_pso_tpu.core.checkpoint import load_pytree, restore_tree
    from gan_discovery_pso_tpu.train.cae import CaeTrainState

    enc = restore_tree(load_pytree(Path(model_dir) / "encoder.msgpack"))
    dec = restore_tree(load_pytree(Path(model_dir) / "decoder.msgpack"))
    return CaeTrainState(
        enc["params"], enc["state"], dec["params"], dec["state"], None,
        jnp.asarray(0, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Classifier battery stage (reference src/training/classifiers.py)
# ---------------------------------------------------------------------------


def run_classifiers(ctx: StageContext, cae_state=None, cae_model_dir=None):
    """Battery training + per-class error-reject curves (reference
    src/training/classifiers.py:165-216): one KNeighborsClassifier(k=5) per
    IiD class fit on the first 80% of the TRAIN embeddings, the reliability
    sweep evaluated on the held-out tail 20% of the same embeddings."""
    if cae_state is None:
        cae_state = load_cae(cae_model_dir)
    ds = ctx.dataset("train", drange=(0, 1))
    emb = encode_dataset(cae_state, ds.images)
    labels = np.asarray(ds.labels)
    block = ctx.cfg.get("model_classifiers") or {}
    k = int(block.get("n_neighbors", 5) or 5)  # reference classifiers.py:184
    val_fraction = float(cfg_default(block, "val_fraction", 0.2))  # 0.0 = no holdout
    battery = train_classifier_battery(emb, labels, k=k, val_fraction=val_fraction)
    save_battery(ctx.run.models_dir / "classifiers.msgpack", battery)

    # embeddings csvs + 2-D latent scatters (reference classifiers.py:150-163
    # re-emits the CAE artifacts from its own run dir)
    from gan_discovery_pso_tpu.train.cae import save_encoded_samples_csv

    val = ctx.dataset("test", drange=(0, 1))
    emb_te = encode_dataset(cae_state, val.images)
    save_encoded_samples_csv(ctx.run.interim_dir / "encoded_samples_train.csv",
                             emb, labels)
    save_encoded_samples_csv(ctx.run.interim_dir / "encoded_samples_valid.csv",
                             emb_te, np.asarray(val.labels))
    if emb.shape[1] == 2:
        reporting.plot_latent_space(emb, labels, ctx.run.general_dir,
                                    dataset="Training")
        reporting.plot_latent_space(emb_te, np.asarray(val.labels),
                                    ctx.run.general_dir, dataset="Validation")

    # classifier battery tree (reference classifiers.py:219-239): each
    # class's TEST embeddings through every classifier, counting positive
    # predictions (KNN predict == proba > 0.5) — fused battery posterior
    # instead of the reference's per-classifier predict loops
    from gan_discovery_pso_tpu.evaluation import compute_posterior as _cp

    te_labels = np.asarray(val.labels)
    p_te = np.asarray(_cp(battery, jnp.asarray(emb_te)))  # [N, C]
    activation = {}
    for label in np.asarray(battery.classes):
        m = te_labels == label
        if m.any():
            activation[int(label)] = (p_te[m] > 0.5).sum(axis=0).tolist()
    reporting.plot_battery_tree(
        activation, list(np.asarray(battery.classes)),
        ctx.run.general_dir / "classifier_battery_tree.png")

    # per-class error-reject curves on the train-tail validation split
    # (reference classifiers.py:167,178-213: x_valid = h_tr rows[-val_size:])
    val_size = int(len(emb) * val_fraction)
    if val_size > 0:
        from gan_discovery_pso_tpu.evaluation import compute_posterior

        x_valid = emb[-val_size:]
        y_valid = labels[-val_size:]
        p_yx = np.asarray(compute_posterior(battery, jnp.asarray(x_valid)))
        for ci, label in enumerate(np.asarray(battery.classes)):
            y_true = (y_valid == label).astype(int)
            reporting.error_reject_curve(
                y_true, p_yx[:, ci],
                ctx.run.general_dir / f"error_reject_curve_{label}.png",
                label=int(label),
            )
    return battery


# ---------------------------------------------------------------------------
# DCGAN stage (reference src/training/dcgan.py + util_dcgan.train)
# ---------------------------------------------------------------------------


def run_dcgan(
    ctx: StageContext,
    cae_state,
    battery,
    epochs: int | None = None,
    n_synthetic: int | None = None,
    resume: bool = False,
    tensorboard: bool = False,
):
    cfg = ctx.cfg
    gdef = GeneratorDef(
        z_dim=int(cfg.trainer_gan.z_dim),
        channels_img=ctx.data_cfg.channel,
        features_g=int(cfg.model_gan.network.units_gen),
    )
    ddef = DiscriminatorDef(
        channels_img=ctx.data_cfg.channel,
        features_d=int(cfg.model_gan.network.units_disc),
    )
    adam = AdamConfig.from_config(cfg.trainer_gan.optimizer)
    bs = int(cfg.trainer_gan.batch_size)
    epochs = epochs if epochs is not None else int(cfg.trainer_gan.epochs)
    if n_synthetic is None:
        n_synthetic = bs * 100  # reference util_dcgan.py:243
    label_smoothing = bool(cfg.trainer_gan.get("label_smoothing", True))
    noise_factor = float(
        # match the CAE's training noise; .get: a dcgan-only config without
        # a model_ae block must not fail here (cfg_default handles None)
        cfg_default(cfg.get("model_ae"), "noise_factor", 0.3)
    )

    ds = ctx.dataset("train", drange=(-1, 1))
    val = ctx.dataset("test", drange=(0, 1))
    # the frozen CAE makes the real-val embeddings constant across the whole
    # run — encode ONCE here instead of once per epoch inside the eval
    from gan_discovery_pso_tpu.evaluation.gan_eval import _cae_encode

    enc_real = _cae_encode(cae_state.enc_params, cae_state.enc_state, val.images)

    state, _ = gan_init(ctx.keys("gan"), gdef, ddef, adam)
    offset = 0
    history = {"loss_gen": [], "loss_disc": [], "fid": [], "is": [], "rec_loss_syn": []}
    if resume:
        prev = ctx.ckpt.try_load("checkpoint_g.msgpack")
        if prev is not None:
            # restore into the freshly-initialized template so NamedTuple
            # types (GanTrainState, optax states, BatchNormStats) come back
            from gan_discovery_pso_tpu.core.checkpoint import restore_into

            state = restore_into(state, prev["state"])
            offset = prev["epoch"] + 1
            # restore the FULL metric history (per-batch losses + per-epoch
            # metrics) — the reference reloads its history.pkl,
            # util_dcgan.py:172-174; the jsonl is per-epoch only and names
            # "is" as "inception_score", so it cannot reconstruct this dict
            from gan_discovery_pso_tpu.core.checkpoint import load_pytree

            hist_file = ctx.run.general_dir / "history_gan.msgpack"
            if not hist_file.exists():  # runs written before the
                # reference-layout move kept it at the reports root
                hist_file = ctx.run.reports_dir / "history_gan.msgpack"
            if hist_file.exists():
                saved_hist = load_pytree(hist_file)
                history = {k: [float(v) for v in saved_hist.get(k, [])]
                           for k in history}
                # Reconcile: the weights checkpoint is written AFTER the
                # history artifact each epoch, so a kill between the two
                # leaves history one epoch AHEAD of the checkpoint. Truncate
                # every series to the checkpoint's epoch count so the resumed
                # run re-appends that epoch instead of duplicating it.
                n_ep = len(history["fid"])
                if n_ep > offset:
                    steps = len(history["loss_gen"]) // n_ep if n_ep else 0
                    for k in ("fid", "is", "rec_loss_syn"):
                        history[k] = history[k][:offset]
                    for k in ("loss_gen", "loss_disc"):
                        history[k] = history[k][: offset * steps]
    if len(ds.images) < bs:
        raise ValueError(
            f"train dataset has {len(ds.images)} images < batch_size {bs} — "
            "the drop-last epoch loop would run zero batches; lower "
            "trainer_gan.batch_size or raise the data cap"
        )
    # opt-in mixed-precision training (--set trainer_gan.compute_dtype=bfloat16):
    # master params/opt state/BN stats stay fp32, forwards+backwards run bf16
    # (train/dcgan.py); gated in bench.py on fp32 loss-trajectory agreement
    compute_dtype = cfg.trainer_gan.get("compute_dtype")
    if compute_dtype is not None:
        compute_dtype = jnp.dtype(str(compute_dtype))
    step = jax.jit(make_gan_train_step(gdef, adam, label_smoothing,
                                       compute_dtype=compute_dtype))
    sampler = make_sampler(gdef)
    mw = ctx.metrics("history_gan", tensorboard=tensorboard)
    if resume:
        # resumed jsonl would otherwise duplicate the reconciled epoch's
        # row; offset==0 (killed during epoch 0, no checkpoint yet) means
        # the whole epoch re-runs, so ALL stale rows go
        mw.drop_rows_from(offset)
    # best-IS tracking survives resume: re-derive from the restored history
    # so an extended run cannot overwrite a better best_g with a worse one
    best_is = max(history["is"][:offset], default=0.0) if offset else 0.0
    best_epoch, best_state = offset, state
    if resume and offset:
        # the disk best_g may be BETTER than the restored last checkpoint
        # (best at an earlier epoch); return that state, not the last one
        prev_best = ctx.ckpt.try_load("best_g.msgpack")
        if prev_best is not None:
            from gan_discovery_pso_tpu.core.checkpoint import restore_into

            best_state = restore_into(state, prev_best["state"])
            best_epoch = int(prev_best.get("epoch", offset))
    fixed_noise_key = ctx.keys("fixed_noise")
    # fixed 32-noise batch + raw (unrescaled) G forward for the per-epoch
    # superimage (reference util_dcgan.py:160, util_report_gan.py:50-55)
    from gan_discovery_pso_tpu.models.dcgan import generator_apply

    fixed_z = jax.random.normal(
        fixed_noise_key, (32, gdef.z_dim, 1, 1), jnp.float32)
    raw_sample = jax.jit(
        lambda gp, gs, z: generator_apply(gp, gs, z, train=False)[0])
    # RNG keyed by ABSOLUTE (epoch, step), not by stateful call counters:
    # a killed-and-resumed run replays the exact tail of the single-shot
    # trajectory (SURVEY §5.3/5.4 deterministic restart; the reference only
    # resumes at epoch granularity with unsaved torch RNG state)
    step_base = ctx.keys.peek("gan_step")
    eval_base = ctx.keys.peek("gan_eval")

    for epoch in range(epochs):
        ep = epoch + offset
        for i, (x, _y) in enumerate(ctx.batches(ds, bs)(ep)):
            k = jax.random.fold_in(jax.random.fold_in(step_base, ep), i)
            state, m = step(state, x, k)
            history["loss_gen"].append(float(m["loss_gen"]))
            history["loss_disc"].append(float(m["loss_disc"]))

        # eval phase (reference :240-270)
        res = evaluate_gan_epoch(
            jax.random.fold_in(eval_base, ep), sampler, state.gen_params, state.gen_state,
            cae_state.enc_params, cae_state.enc_state,
            cae_state.dec_params, cae_state.dec_state,
            battery, val.images, n_synthetic=n_synthetic, enc_real=enc_real,
            noise_factor=noise_factor,
        )
        fid, is_score = float(res.fid), float(res.inception_score)
        rec = float(res.rec_loss_syn)
        history["fid"].append(fid)
        history["is"].append(is_score)
        history["rec_loss_syn"].append(rec)
        mw.append(ep, loss_gen=history["loss_gen"][-1],
                  loss_disc=history["loss_disc"][-1], fid=fid,
                  inception_score=is_score, rec_loss_syn=rec)
        # full history artifact for resume (≡ the reference's history_gan.pkl
        # dump every epoch, util_dcgan.py:275-277), then the per-epoch
        # weights checkpoint with optimizer state (reference :225-238).
        # ORDER MATTERS for crash consistency: history first, checkpoint
        # last, so the checkpoint epoch never exceeds the recorded history —
        # a kill anywhere in the epoch leaves a state the resume path's
        # truncation reconciles exactly (no lost or duplicated epochs).
        save_pytree(ctx.run.general_dir / "history_gan.msgpack",
                    {k: np.asarray(v, np.float64) for k, v in history.items()})
        ctx.ckpt.save_every_epoch("g", ep, state, loss=history["loss_gen"][-1])
        print(f"[dcgan] epoch {ep}: fid={fid:.3f} is={is_score:.4f} rec={rec:.4f}")

        # plots + fixed-noise superimage (reference :272-297); per-batch
        # losses and per-epoch metrics get separate figures/x-axes
        # (util_report_gan.py:9-45); curves live in training_plot/, the
        # superimage in general/, like the reference layout (dcgan.py:138-146)
        reporting.plot_gan_training(history, ctx.run.plot_dir)
        # raw tanh output (-1,1) for the superimage — save_synthetic_images
        # takes generator(fixed_noise)[:16] unrescaled (util_report_gan.py:51)
        raw = raw_sample(state.gen_params, state.gen_state, fixed_z)
        reporting.superimage(
            np.asarray(raw), ctx.run.general_dir / f"synthetic_images_{ep}.png",
            drange=(-1, 1), cap=16,
        )
        imgs = sampler(state.gen_params, state.gen_state, fixed_noise_key, 32)
        # real/fake grids to TensorBoard (reference util_dcgan.py:285-297).
        # sampler output is already per-sample rescaled to [0,1]
        # (train/dcgan.py make_sampler); real batches are in drange (-1,1)
        if mw.has_tensorboard:  # grid construction is wasted otherwise
            mw.add_image(
                "Fake", reporting.grid_canvas(np.asarray(imgs)[:32], drange=(0, 1)),
                step=ep,
            )
            mw.add_image(
                "Real", reporting.grid_canvas(np.asarray(x)[:32], drange=(-1, 1)),
                step=ep,
            )
        reporting.plot_posterior_polarization(
            np.asarray(res.p_yx), list(np.asarray(battery.classes)),
            ctx.run.general_dir / f"class_polarization_{ep}.png",
        )
        # posterior energy/variance hist + kde pairs
        # (reference util_dcgan.py:268 → util_gan_evaluation.py:167-192,
        # written to general_reports_dir)
        reporting.plot_posterior_histograms(
            {"energy": np.asarray(res.energy),
             "variance": np.asarray(res.variance)},
            ctx.run.general_dir, ep,
        )

        # best model by IS, saved ON IMPROVEMENT (reference :279-283) so a
        # crash never loses the best-so-far weights and a resumed run that
        # never beats the restored best leaves the existing best_g intact
        if is_score > best_is:
            best_is, best_epoch, best_state = is_score, ep, state
            ctx.ckpt.save_best("g", best_epoch, best_state)

    if not (ctx.ckpt.model_dir / "best_g.msgpack").exists():
        # no epoch ever improved best_is (e.g. IS was NaN throughout a
        # diverged run, where `nan > best` is always False) — downstream
        # stages hard-require best_g.msgpack, so persist the final state
        # rather than leave the run dir unusable
        print("[dcgan] WARNING: no epoch improved the inception score; "
              "saving the final state as best_g")
        ctx.ckpt.save_best("g", best_epoch, best_state)

    mw.close()
    ctx.run.write_timing({})  # (reference dcgan.py:209-214)
    ctx.run.write_overall_history(history)
    return best_state, history


def load_gan(model_dir: str | Path, best: bool = True):
    """Rebuild GanTrainState pytree arrays from a checkpoint (reference
    load_gan, util_dcgan.py:29-34). Returns (gen_params, gen_state)."""
    from gan_discovery_pso_tpu.core.checkpoint import load_pytree

    name = "best_g.msgpack" if best else "checkpoint_g.msgpack"
    from gan_discovery_pso_tpu.core.checkpoint import restore_tree

    d = load_pytree(Path(model_dir) / name)
    state = restore_tree(d["state"])
    return state["gen_params"], state["gen_state"]


# ---------------------------------------------------------------------------
# Assessor CNN stages (reference src/training/cnn.py, cnn_multipatient.py)
# ---------------------------------------------------------------------------


def assessor_factory(cfg, data_cfg, n_class: int):
    """Model factory matching the reference get_cnn (util_cnn.py:24-38):
    returns (mdef, init_fn, apply_fn) for ResNet50/101/152 or AlexNet."""
    name = str(cfg.model_cnn.model_name)
    iid = tuple(data_cfg.iid_classes)
    if name.startswith("ResNet"):
        return ResNetDef(name, data_cfg.channel, n_class, iid), None, None
    if name == "AlexNet":
        from gan_discovery_pso_tpu.models import AlexNetDef, alexnet_apply, alexnet_init

        net = cfg.model_cnn.get("network", {})
        pad = 0 if str(net.get("padding", "valid")) == "valid" else 1
        mdef = AlexNetDef(
            image_channels=data_cfg.channel, n_class=n_class,
            img_size=data_cfg.image_size, kernel=int(net.get("kernel", 3)),
            padding=pad, iid_classes=iid,
            activation=str(net.get("cnn_activation", "LeakyReLU")),
        )
        return mdef, (lambda k, d, init: alexnet_init(k, d, init=init)), alexnet_apply
    raise ValueError(name)


def _assessor(ctx: StageContext, n_class: int):
    return assessor_factory(ctx.cfg, ctx.data_cfg, n_class)


def run_cnn(ctx: StageContext, epochs: int | None = None, classes=None):
    """Per-class one-vs-all battery (reference cnn.py:154-246)."""
    cfg = ctx.cfg
    adam = AdamConfig.from_config(cfg.trainer_cnn.optimizer)
    bs = int(cfg.trainer_cnn.batch_size)
    epochs = epochs if epochs is not None else int(cfg.trainer_cnn.epochs)
    early = int(cfg.trainer_cnn.early_stopping)
    patience = int(cfg.trainer_cnn.scheduler.patience)
    classes = classes if classes is not None else ctx.data_cfg.iid_classes

    ds = ctx.dataset("train", drange=(0, 1))
    tr, va = train_val_split(ds, 0.2)

    # reference cnn.py:170 initializes from model_cnn.network.cnn_initializer
    init_name = str(cfg.model_cnn.get("network", {}).get("cnn_initializer", "glorot_normal"))
    models = {}
    histories = {}
    for label in classes:
        rdef, init_fn, apply_fn = _assessor(ctx, 2)
        state, history, best_epoch = train_cnn(
            ctx.keys.child(f"cnn_{label}")("init"), rdef, adam,
            ctx.batches(tr, bs), ctx.batches(va, bs, drop_last=False),
            num_epochs=epochs, early_stopping=early, scheduler_patience=patience,
            label=label, init=init_name, init_fn=init_fn, apply_fn=apply_fn,
        )
        ctx.ckpt.save_state_dict(f"model_{label}", {"params": state.params, "state": state.model_state})
        reporting.plot_training_curves(history, ctx.run.reports_dir / f"cnn_{label}.png")
        reporting.plot_cnn_training(history, ctx.run.plot_dir, label=label)
        models[label] = state
        histories[label] = history
    ctx.run.write_timing({})  # (reference cnn.py:198-205)
    ctx.run.write_overall_history(histories)

    # --- evaluation phase (reference cnn.py:211-246): each class's POSITIVE
    # validation slices go through EVERY battery member; the line per class
    # plots how many each classifier flags positive (argmax==1). The
    # reference loops classifiers on the host; all battery members share
    # shapes here, so ONE vmapped jitted forward over tree-stacked params
    # evaluates the whole battery per chunk.
    params_stack = jax.tree.map(
        lambda *x: jnp.stack(x), *[models[l].params for l in classes])
    state_stack = jax.tree.map(
        lambda *x: jnp.stack(x), *[models[l].model_state for l in classes])
    # the factory returns apply_fn=None for the default ResNet assessor
    # (train_cnn resolves it the same way)
    from gan_discovery_pso_tpu.models import resnet_apply

    eval_apply = apply_fn if apply_fn is not None else resnet_apply

    @jax.jit
    def battery_positive(ps, ss, x):
        def one(p, s):
            logits, _ = eval_apply(p, s, x, rdef, train=False)
            return jnp.argmax(logits, axis=1)  # torch.max(output,1) preds

        return jax.vmap(one)(ps, ss)  # [n_classifiers, n_images]

    va_labels = np.asarray(va.labels)
    activation = {}
    for label in classes:
        x_pos = va.images[va_labels == label]
        counts = np.zeros(len(classes), np.int64)
        for i in range(0, x_pos.shape[0], 256):  # bound vmapped activations
            counts += np.asarray(
                battery_positive(params_stack, state_stack,
                                 x_pos[i:i + 256])).sum(axis=1)
        activation[int(label)] = counts.tolist()
    reporting.plot_battery_tree(
        activation, list(classes),
        ctx.run.general_dir / "classifier_battery_tree.png")
    return models


def run_cnn_multipatient(ctx: StageContext, epochs: int | None = None):
    """Single n-way assessor (reference cnn_multipatient.py:151-179)."""
    cfg = ctx.cfg
    adam = AdamConfig.from_config(cfg.trainer_cnn.optimizer)
    bs = int(cfg.trainer_cnn.batch_size)
    epochs = epochs if epochs is not None else int(cfg.trainer_cnn.epochs)
    iid = tuple(ctx.data_cfg.iid_classes)
    rdef, init_fn, apply_fn = _assessor(ctx, len(iid))

    ds = ctx.dataset("train", drange=(0, 1))
    tr, va = train_val_split(ds, 0.2)
    state, history, best_epoch = train_cnn(
        ctx.keys("cnn_multi"), rdef, adam,
        ctx.batches(tr, bs), ctx.batches(va, bs, drop_last=False),
        num_epochs=epochs,
        early_stopping=int(cfg.trainer_cnn.early_stopping),
        scheduler_patience=int(cfg.trainer_cnn.scheduler.patience),
        label=None,
        # reference cnn_multipatient.py:160 honors network.cnn_initializer
        init=str(cfg.model_cnn.get("network", {}).get("cnn_initializer", "glorot_normal")),
        init_fn=init_fn, apply_fn=apply_fn,
    )
    ctx.ckpt.save_state_dict("model", {"params": state.params, "state": state.model_state})
    reporting.plot_training_curves(history, ctx.run.reports_dir / "cnn_multipatient.png")
    reporting.plot_cnn_training(history, ctx.run.plot_dir)
    ctx.run.write_timing({})  # (reference cnn_multipatient.py:186-193)
    ctx.run.write_overall_history(history)
    return state, rdef


def load_cnn(model_dir: str | Path, rdef: ResNetDef, label=None):
    from gan_discovery_pso_tpu.core.checkpoint import load_pytree

    name = f"model_{label}.msgpack" if label is not None else "model.msgpack"
    from gan_discovery_pso_tpu.core.checkpoint import restore_tree

    d = load_pytree(Path(model_dir) / name)
    params, state = restore_tree(d["params"]), restore_tree(d["state"])
    # Architecture mismatch diagnosis: the checkpoint's param keys reveal the
    # family it was trained as. Loading an AlexNet checkpoint through a
    # ResNetDef (or vice versa) would otherwise surface as a KeyError deep
    # inside a jitted fitness trace.
    looks_resnet = "bn1" in params and "layer1" in params
    looks_alexnet = "fc1" in params and "conv4" in params
    want_resnet = type(rdef).__name__ == "ResNetDef"
    if want_resnet and looks_alexnet:
        raise ValueError(
            f"{model_dir}/{name} is an AlexNet checkpoint but the config "
            "resolves a ResNet assessor — set model_cnn.model_name=AlexNet "
            "(and its network block) for THIS stage too, not only for "
            "cnn/cnn-multipatient"
        )
    if not want_resnet and looks_resnet:
        raise ValueError(
            f"{model_dir}/{name} is a ResNet checkpoint but the config "
            "resolves an AlexNet assessor — drop model_cnn.model_name="
            "AlexNet for this stage or point --path-cnn at an AlexNet run"
        )
    return params, state


# ---------------------------------------------------------------------------
# Inverter stage (reference src/training/inverter.py)
# ---------------------------------------------------------------------------


def _inverter_epoch_viz(ctx, gen_params, gen_state, enc_fwd, phase_sets,
                        epoch, fixed_noise, n_img: int = 10):
    """The reference's per-epoch inverter visuals (util_inverter.py:259,280
    / :455,477): `img_loss_{phase}_{epoch}.png` — the first n_img images of
    each phase next to their E→G reconstructions (show_cae_images,
    util_report_inverter.py:138-159) — and `synthetic_images_{epoch}.png`,
    the G samples of one FIXED noise batch (show_gan_images, :100-136)."""
    from gan_discovery_pso_tpu.models.dcgan import generator_apply

    for phase, ds in phase_sets.items():
        if len(ds.images) == 0:
            continue
        x = ds.images[:n_img]
        rec, _ = generator_apply(gen_params, gen_state, enc_fwd(x), train=False)
        reporting.recon_panel(
            np.asarray(x), np.asarray(rec),
            ctx.run.general_dir / f"img_loss_{phase}_{epoch}.png")
    synth, _ = generator_apply(gen_params, gen_state, fixed_noise, train=False)
    # reference show_gan_images superimage (util_report_inverter.py:100-131)
    reporting.superimage(
        np.asarray(synth),
        ctx.run.general_dir / f"synthetic_images_{epoch}.png", drange=(-1, 1))


def run_inverter(
    ctx: StageContext,
    gen_params,
    gen_state,
    cnn=None,  # (params, state, ResNetDef) for the perceptual loss
    epochs: int | None = None,
    viz_every: int = 1,
):
    cfg = ctx.cfg
    latent = int(cfg.model_inverter.latent_space)
    adam = AdamConfig.from_config(cfg.trainer_inverter.encoder_optimizer)
    bs = int(cfg.trainer_inverter.batch_size)
    epochs = epochs if epochs is not None else int(cfg.trainer_inverter.epochs)
    training_fun = str(cfg.trainer_inverter.training_function)

    iid = ctx.dataset("train", drange=(-1, 1))
    val_iid = ctx.dataset("test", drange=(-1, 1))
    val_ood = ctx.dataset("test", classes=ctx.data_cfg.ood_classes, drange=(-1, 1))
    # per-epoch visuals: phase recon panels + fixed-noise sample grid
    # (reference util_inverter.py:221,259,280)
    phase_sets = {"train": iid, "val_iid": val_iid, "val_ood": val_ood}
    fixed_noise = jax.random.normal(
        ctx.keys("inv_fixed_noise"), (32, latent, 1, 1), jnp.float32)

    variant = str(cfg.model_inverter.get("encoder_variant", "dcgan") or "dcgan")
    tx = make_optimizer(adam)
    history: dict = {}
    mw = ctx.metrics("history_inverter")

    if variant == "attgan" and training_fun == "pix_rec":
        # AttGAN-style stateful encoder (reference util_inverter.py:142-162).
        # The pix_fea_rec_adv combination (the reference's train-fn dispatch
        # is encoder-agnostic, util_inverter.py:31-87) shares the adversarial
        # loop below via make_pix_fea_rec_adv_step_stateful.
        from gan_discovery_pso_tpu.models import (
            EncoderAttGANDef,
            encoder_attgan_apply,
            encoder_attgan_init,
        )
        from gan_discovery_pso_tpu.train.inverter import (
            PixRecStatefulState,
            make_pix_rec_step_stateful,
        )

        adef = EncoderAttGANDef(enc_dim=latent, channels_img=ctx.data_cfg.channel)
        aep, aes = jit_init(encoder_attgan_init, adef)(ctx.keys("enc"))
        state = PixRecStatefulState(aep, aes, tx.init(aep), jnp.asarray(0, jnp.int32))
        train_step, eval_step = make_pix_rec_step_stateful(
            gen_params, gen_state, adam,
            lambda p, st, x, train: encoder_attgan_apply(p, st, x, train=train),
        )
        best, best_params, best_state = np.inf, state.enc_params, state.enc_state
        history = {"train_loss": [], "val_iid_loss": [], "val_ood_loss": []}
        for epoch in range(epochs):
            tl = []
            for x, _y in ctx.batches(iid, bs)(epoch):
                state, loss = train_step(state, x)
                tl.append(float(loss))
            vi = [float(eval_step(state, x)) for x, _ in ctx.batches(val_iid, bs, drop_last=False)(epoch)]
            vo = [float(eval_step(state, x)) for x, _ in ctx.batches(val_ood, bs, drop_last=False)(epoch)]
            tr_l = float(np.mean(tl))
            vi_l = float(np.mean(vi)) if vi else np.nan
            vo_l = float(np.mean(vo)) if vo else np.nan
            history["train_loss"].append(tr_l)
            history["val_iid_loss"].append(vi_l)
            history["val_ood_loss"].append(vo_l)
            mw.append(epoch, train_loss=tr_l, val_iid_loss=vi_l, val_ood_loss=vo_l)
            # empty val set → vi_l is NaN and `nan < best` is always False,
            # which would silently keep the RANDOM INIT as "best"; fall back
            # to the train loss so something trained is always saved
            sel = vi_l if np.isfinite(vi_l) else tr_l
            if sel < best:
                best, best_params, best_state = sel, state.enc_params, state.enc_state
            if viz_every and epoch % viz_every == 0:
                _inverter_epoch_viz(
                    ctx, gen_params, gen_state,
                    lambda x, st=state: encoder_attgan_apply(
                        st.enc_params, st.enc_state, x, train=False)[0],
                    phase_sets, epoch, fixed_noise)
        ctx.ckpt.save_state_dict("encoder", {"params": best_params, "state": best_state,
                                             "variant": "attgan"})
        reporting.plot_training_curves(history, ctx.run.reports_dir / "inverter_training.png")
        mw.close()
        ctx.run.write_timing({})
        ctx.run.write_overall_history(history)
        return best_params, history

    if variant != "attgan":
        enc_params, _ = jit_init(
            encoder_init, EncoderDef(enc_dim=latent, channels_img=ctx.data_cfg.channel)
        )(ctx.keys("enc"))
    elif training_fun != "pix_fea_rec_adv":
        raise ValueError(
            f"encoder_variant=attgan supports training_function pix_rec or "
            f"pix_fea_rec_adv, not {training_fun!r}")

    if training_fun == "pix_rec":
        state = PixRecState(enc_params, tx.init(enc_params), jnp.asarray(0, jnp.int32))
        train_step, eval_step = make_pix_rec_step(gen_params, gen_state, adam)
        best, best_params = np.inf, state.enc_params
        history = {"train_loss": [], "val_iid_loss": [], "val_ood_loss": []}
        for epoch in range(epochs):
            tl = []
            for x, _y in ctx.batches(iid, bs)(epoch):
                state, loss = train_step(state, x)
                tl.append(float(loss))
            vi = [float(eval_step(state, x)) for x, _ in ctx.batches(val_iid, bs, drop_last=False)(epoch)]
            vo = [float(eval_step(state, x)) for x, _ in ctx.batches(val_ood, bs, drop_last=False)(epoch)]
            tr_l, vi_l = float(np.mean(tl)), float(np.mean(vi)) if vi else np.nan
            vo_l = float(np.mean(vo)) if vo else np.nan
            history["train_loss"].append(tr_l)
            history["val_iid_loss"].append(vi_l)
            history["val_ood_loss"].append(vo_l)
            mw.append(epoch, train_loss=tr_l, val_iid_loss=vi_l, val_ood_loss=vo_l)
            # empty val set → vi_l is NaN and `nan < best` is always False,
            # which would silently keep the RANDOM INIT as "best"; fall back
            # to the train loss so something trained is always saved
            sel = vi_l if np.isfinite(vi_l) else tr_l
            if sel < best:  # best by val_iid (reference :273-277)
                best, best_params = sel, state.enc_params
            if viz_every and epoch % viz_every == 0:
                from gan_discovery_pso_tpu.models.encoder import encoder_forward

                _inverter_epoch_viz(
                    ctx, gen_params, gen_state,
                    lambda x, p=state.enc_params: encoder_forward(p, x),
                    phase_sets, epoch, fixed_noise)
        enc_final = best_params
    elif training_fun == "pix_fea_rec_adv":
        if cnn is None:
            raise ValueError("pix_fea_rec_adv needs the multipatient cnn")
        cnn_params, cnn_state, cnn_def = cnn
        from gan_discovery_pso_tpu.models import discriminator_init

        disc_params, _ = discriminator_init(
            ctx.keys("disc"),
            DiscriminatorDef(ctx.data_cfg.channel, int(cfg.model_inverter.D_network.units_disc)),
        )
        adam_d = AdamConfig.from_config(cfg.trainer_inverter.discriminator_optimizer)
        if variant == "attgan":
            from gan_discovery_pso_tpu.models import (
                EncoderAttGANDef,
                encoder_attgan_apply,
                encoder_attgan_init,
            )
            from gan_discovery_pso_tpu.train.inverter import (
                PixFeaRecAdvStatefulState,
                make_pix_fea_rec_adv_step_stateful,
            )

            adef = EncoderAttGANDef(enc_dim=latent, channels_img=ctx.data_cfg.channel)
            aep, aes = jit_init(encoder_attgan_init, adef)(ctx.keys("enc"))
            enc_apply_fn = (
                lambda p, st, x, train: encoder_attgan_apply(p, st, x, train=train))
            state = PixFeaRecAdvStatefulState(
                aep, aes, disc_params, tx.init(aep),
                make_optimizer(adam_d).init(disc_params), jnp.asarray(0, jnp.int32),
            )
            train_step, eval_step = make_pix_fea_rec_adv_step_stateful(
                gen_params, gen_state, cnn_params, cnn_state, cnn_def, adam,
                adam_d, enc_apply_fn)

            def enc_snapshot(st):
                return (st.enc_params, st.enc_state)

            def enc_viz(st):
                return lambda x: enc_apply_fn(st.enc_params, st.enc_state, x, False)[0]
        else:
            from gan_discovery_pso_tpu.models.encoder import encoder_forward

            state = PixFeaRecAdvState(
                enc_params, disc_params, tx.init(enc_params),
                make_optimizer(adam_d).init(disc_params), jnp.asarray(0, jnp.int32),
            )
            train_step, eval_step = make_pix_fea_rec_adv_step(
                gen_params, gen_state, cnn_params, cnn_state, cnn_def, adam, adam_d
            )

            def enc_snapshot(st):
                return st.enc_params

            def enc_viz(st):
                return lambda x, p=st.enc_params: encoder_forward(p, x)

        best, best_params = np.inf, enc_snapshot(state)
        for epoch in range(epochs):
            tr_metrics = []
            for x, _y in ctx.batches(iid, bs)(epoch):
                state, m = train_step(state, x, ctx.keys("inv_step"))
                tr_metrics.append(m)

            def _mean_key(ms, k):
                vals = [float(m[k]) for m in ms if k in m]
                return float(np.mean(vals)) if vals else np.nan

            def _phase(batches_fn, phase):
                ms = [eval_step(state, x, ctx.keys("inv_eval"))
                      for x, _ in batches_fn(epoch)]
                # per-phase component series for {phase}_G_losses.png
                # (reference util_report_inverter.py:41-74)
                for k in ("loss_enc", "loss_enc_adv", "loss_enc_rec_pix",
                          "loss_enc_rec_fea"):
                    history.setdefault(f"{phase}_{k}", []).append(_mean_key(ms, k))
                if not ms:
                    return np.nan, np.nan
                pixfea = float(np.mean([
                    float(m["loss_enc_rec_pix"] + m["loss_enc_rec_fea"]) for m in ms
                ]))
                return pixfea, _mean_key(ms, "loss_enc")

            # all three reference phases (util_inverter.py:349)
            vi_pixfea, vi_total = _phase(ctx.batches(val_iid, bs, drop_last=False), "val_iid")
            vo_pixfea, vo_total = _phase(ctx.batches(val_ood, bs, drop_last=False), "val_ood")
            tr_loss = _mean_key(tr_metrics, "loss_enc")
            for k in ("loss_enc_adv", "loss_enc_rec_pix", "loss_enc_rec_fea",
                      "loss_disc", "loss_disc_adv", "loss_disc_r1penalty"):
                history.setdefault(f"train_{k}", []).append(_mean_key(tr_metrics, k))
            for k, v in (("train_loss_enc", tr_loss),
                         ("val_iid_pixfea", vi_pixfea),
                         ("val_ood_pixfea", vo_pixfea)):
                history.setdefault(k, []).append(v)
            mw.append(epoch, train_loss_enc=tr_loss, val_iid_pixfea=vi_pixfea,
                      val_ood_pixfea=vo_pixfea)
            # NaN-guard like the other phases: empty val set falls back to
            # the train loss so random-init weights are never "best"
            sel = vi_pixfea if np.isfinite(vi_pixfea) else tr_loss
            if sel < best:  # best by val_iid pix+fea (reference :470-475)
                best, best_params = sel, enc_snapshot(state)
            if viz_every and epoch % viz_every == 0:
                _inverter_epoch_viz(
                    ctx, gen_params, gen_state, enc_viz(state),
                    phase_sets, epoch, fixed_noise)
        enc_final = best_params
    else:
        raise ValueError(training_fun)

    if variant == "attgan":
        enc_p, enc_s = enc_final
        ctx.ckpt.save_state_dict(
            "encoder", {"params": enc_p, "state": enc_s, "variant": "attgan"})
    else:
        ctx.ckpt.save_state_dict("encoder", {"params": enc_final})
    summary_keys = ("train_loss", "val_iid_loss", "val_ood_loss",
                    "train_loss_enc", "val_iid_loss_enc", "val_ood_loss_enc",
                    "val_iid_pixfea", "val_ood_pixfea")
    reporting.plot_training_curves(
        {k: v for k, v in history.items() if k in summary_keys},
        ctx.run.reports_dir / "inverter_training.png")
    # per-phase component figures (reference {phase}_G/D_losses.png)
    for phase in ("train", "val_iid", "val_ood"):
        reporting.plot_phase_losses(history, ctx.run.plot_dir, phase)
    mw.close()
    ctx.run.write_timing({})  # (reference inverter.py:242-249)
    ctx.run.write_overall_history(history)
    return enc_final, history


def load_encoder(model_dir: str | Path):
    """Plain-encoder params for the downstream consumers (extractors,
    pso-inverter, invert/invert_bn), which apply the dcgan-mirror Encoder —
    exactly like the reference, whose extractors hard-instantiate
    `util_inverter.Encoder` (iid_extractor.py:170). An AttGAN-variant
    checkpoint has a different layout, so refuse it HERE with a diagnosis
    instead of crashing later in a conv shape mismatch."""
    from gan_discovery_pso_tpu.core.checkpoint import load_pytree

    d = load_pytree(Path(model_dir) / "encoder.msgpack")
    if d.get("variant") == b"attgan" or d.get("variant") == "attgan":
        raise ValueError(
            f"{model_dir}: this inverter run trained the AttGAN encoder "
            "variant; the downstream stages (extractors, pso-inverter, "
            "gradient inversion) consume the plain dcgan-mirror encoder — "
            "train the inverter without model_inverter.encoder_variant="
            "attgan for those paths (the reference has the same constraint: "
            "its extractors hard-instantiate the plain Encoder)"
        )
    return jax.tree.map(jnp.asarray, d["params"])


# ---------------------------------------------------------------------------
# Latent extractors (reference iid_extractor.py / ood_extractor.py)
# ---------------------------------------------------------------------------


def run_extractor(ctx: StageContext, enc_params, kind: str = "iid",
                  max_per_class: int = 256, gen=None):
    """Batch-encode images per class into pseudo-particle artifacts
    (reference iid_extractor.py:177-216 — pickles shaped like PSO output).

    When `gen=(gen_params, gen_state)` is given, also emits the reference's
    per-class `general/{label}/synthetic_images_{batch}.png` superimages of
    G(E(x)) (iid_extractor.py:181-199 via show_gan_images; the whole
    extracted slice decodes as ONE batch here, so batch index is 0)."""
    classes = ctx.data_cfg.iid_classes if kind == "iid" else ctx.data_cfg.ood_classes
    ds = ctx.dataset("train", classes=classes, drange=(-1, 1))

    @jax.jit
    def encode(x):
        z, _ = encoder_apply(enc_params, {}, x)
        return z.reshape(z.shape[0], -1)

    decode = None
    if gen is not None:
        from gan_discovery_pso_tpu.models.dcgan import generator_apply

        gp, gs = gen
        decode = jax.jit(lambda z: generator_apply(
            gp, gs, z[..., None, None], train=False)[0])

    out = {}
    labels = np.asarray(ds.labels)
    for label in classes:
        imgs = ds.images[labels == label][:max_per_class]
        z = np.asarray(encode(imgs))
        if decode is not None and len(z):
            d = ctx.run.general_dir / str(label)
            d.mkdir(parents=True, exist_ok=True)
            reporting.superimage(np.asarray(decode(jnp.asarray(z))),
                                 d / "synthetic_images_0.png", drange=(-1, 1))
        # single-"iteration" trajectory: [1, N, d] with zero velocities
        save_particle_histories(
            ctx.run.interim_dir, label, z[None], np.zeros_like(z)[None], kind=kind
        )
        out[label] = z
    return out


# ---------------------------------------------------------------------------
# Hybrid PSO inverter (reference src/training/pso_inverter.py)
# ---------------------------------------------------------------------------


def run_pso_inverter(
    ctx: StageContext,
    gen_params,
    gen_state,
    enc_params,
    cnn_params,
    cnn_state,
    cnn_def: ResNetDef,
    ood_patient: int | None = None,
    fine_tune_epochs: int | None = None,
):
    """Phase 1: re-head + fine-tune the assessor to (not-patient, patient)
    (reference :222-263). Phase 2: encoder-seeded swarm with the hybrid
    fitness; n_particles = #slices capped at 256 (:279-284)."""
    cfg = ctx.cfg
    if ood_patient is None:
        ood_patient = int(cfg.pso_inverter.ood_patient)
    hp = PsoConfig.from_config(cfg.trainer_pso_inverter)
    control = str(cfg.trainer_pso_inverter.get("control_pso_fitness", OPTIMIZE_IN))

    # --- phase 1: binary assessor for this patient
    from gan_discovery_pso_tpu.models import change_classifier_head
    from gan_discovery_pso_tpu.train.cnn import CnnTrainState

    adam = AdamConfig.from_config(cfg.trainer_pso_inverter.optimizer)
    bdef = ResNetDef(cnn_def.model_name, cnn_def.image_channels, 2,
                     tuple(ctx.data_cfg.iid_classes) + (ood_patient,))
    reheaded = change_classifier_head(ctx.keys("rehead"), cnn_params, 2)
    epochs = fine_tune_epochs if fine_tune_epochs is not None else int(
        cfg.trainer_pso_inverter.epochs
    )
    # opportunistic resume: reuse an already-fine-tuned assessor
    # (reference pso_inverter.py:224-231 try-load-else-train)
    from gan_discovery_pso_tpu.core.checkpoint import restore_tree

    saved = ctx.ckpt.try_load(f"model_{ood_patient}.msgpack")
    cnn_history = None
    if saved is not None:
        from gan_discovery_pso_tpu.train.cnn import CnnTrainState as _CTS

        fine_state = _CTS(restore_tree(saved["params"]), restore_tree(saved["state"]),
                          None, jnp.asarray(1.0, jnp.float32), jnp.asarray(0, jnp.int32))
    else:
        all_ds = ctx.dataset(
            "train",
            classes=tuple(ctx.data_cfg.iid_classes) + (ood_patient,),
            drange=(0, 1),
        )
        tr, va = train_val_split(all_ds, 0.2)
        tx = make_optimizer(adam)
        init_state = CnnTrainState(reheaded, cnn_state, tx.init(reheaded),
                                   jnp.asarray(1.0, jnp.float32), jnp.asarray(0, jnp.int32))
        bs = int(cfg.trainer_pso_inverter.batch_size)
        fine_state, _h, _be = train_cnn(
            ctx.keys("finetune"), bdef, adam,
            ctx.batches(tr, bs), ctx.batches(va, bs, drop_last=False),
            num_epochs=epochs,
            early_stopping=int(cfg.trainer_pso_inverter.early_stopping),
            label=ood_patient, init_state=init_state,
        )
        ctx.ckpt.save_state_dict(f"model_{ood_patient}",
                                 {"params": fine_state.params, "state": fine_state.model_state})
        # fine-tune training figures (reference pso_inverter.py:263)
        reporting.plot_cnn_training(_h, ctx.run.plot_dir, label=ood_patient)
        cnn_history = _h

    # --- phase 2: encoder-seeded swarm over the patient's slices
    ood = ctx.dataset("train", classes=(ood_patient,), drange=(-1, 1))
    n = min(ood.images.shape[0], hp.n_particles, 256)
    slices = ood.images[:n]

    @jax.jit
    def encode(x):
        z, _ = encoder_apply(enc_params, {}, x)
        return z.reshape(z.shape[0], -1)

    init_positions = encode(slices)
    hp_n = PsoConfig(**{**hp.__dict__, "n_particles": n})

    # params-as-arguments runner: every patient of the sweep (each with its
    # own fine-tuned assessor) reuses ONE compiled executable per shape
    from gan_discovery_pso_tpu.pso import make_inverter_runner

    run = make_inverter_runner(bdef, hp_n, control=control)
    import time as _time

    _t0 = _time.time()
    final, hist, init = run(
        ctx.keys("pso"), gen_params, gen_state,
        fine_state.params, fine_state.model_state,
        jnp.asarray(1, jnp.int32), slices, init_positions,
    )
    np.asarray(final.g_best_val)  # result-transfer barrier (see bench.py)
    res_wall = _time.time() - _t0
    res = SwarmResult(final, hist, init, hp_n)
    save_particle_histories(
        ctx.run.interim_dir, ood_patient,
        res.particle_trajectories(), res.velocity_trajectories(), kind="ood",
    )
    # swarm diagnostics + per-iteration artifacts, same contract/layout as
    # the discovery stage (reference pso_inverter.py:326-346: pso_iter.png,
    # mean_mse.png, pso_dim plots, 2d_plot frames + pkls, image grids/GIF) —
    # nested one level under the patient id so patient sweeps don't collide.
    # The reference's plot2d uses the pure ASSESSOR fitness, not the hybrid
    # objective (pso_inverter.py:330 passes discovery.fitness)
    from gan_discovery_pso_tpu.pipelines.pso_discovery import (
        emit_swarm_reports,
        render_swarm_grids,
    )
    from gan_discovery_pso_tpu.pso import make_discovery_fitness_dynamic

    fitness = None
    if hp_n.dim_space == 2:
        fitness_dyn = make_discovery_fitness_dynamic(
            gen_params, gen_state, fine_state.params, fine_state.model_state,
            bdef, control=control,
        )
        fitness = lambda pos: fitness_dyn(pos, jnp.asarray(1, jnp.int32))  # noqa: E731
    emit_swarm_reports(ctx, res, ood_patient, gen_params, gen_state,
                       fitness=fitness, title=f"ood patient {ood_patient}")
    render_swarm_grids(ctx, gen_params, gen_state, res, ood_patient,
                       tag=f"patient_{ood_patient}")
    ctx.run.write_timing({
        f"pso_inverter_time_ood_patient_{ood_patient}": res_wall,
    })
    # overall_history.pkl with the reference's keys (pso_inverter.py:261,346:
    # cnn fine-tune history — only when trained, try-load leaves it absent —
    # plus the swarm history)
    overall_history = {
        f"pso_inverter_history_ood_patient_{ood_patient}": res.history_dict(),
    }
    if cnn_history is not None:
        overall_history[f"cnn_history_ood_patient_{ood_patient}"] = cnn_history
    ctx.run.write_overall_history(overall_history)
    return res, fine_state


# ---------------------------------------------------------------------------
# Gradient inversion stages (reference regularize_inverter*.py)
# ---------------------------------------------------------------------------


def _regularize_snapshots_and_pickle(ctx, gen_params, gen_state, enc_params,
                                     images, z_final, labels):
    """The reference's per-image artifacts from the invert/invert_bn loops
    (regularize_inverter[_statistics].py:171-190): `ori.png` / `enc.png` /
    `inv.png` single-image snapshots — rewritten per image there, so the
    LAST image's triptych is what survives — and the inverted-latent
    DataFrame `particles_position_ood.pkl` (rows = images, columns = z
    features + a final uint8 label column, :184-190)."""
    from gan_discovery_pso_tpu.models.dcgan import generator_apply
    from gan_discovery_pso_tpu.models.encoder import encoder_forward
    from gan_discovery_pso_tpu.ops import postprocess_uint8

    last = images[-1:]
    enc_rec, _ = generator_apply(
        gen_params, gen_state, encoder_forward(enc_params, last), train=False)
    inv_rec, _ = generator_apply(
        gen_params, gen_state, jnp.asarray(z_final[-1:]), train=False)
    for name, img in (("ori", last), ("enc", enc_rec), ("inv", inv_rec)):
        reporting.save_grayscale(
            ctx.run.general_dir / f"{name}.png",
            np.asarray(postprocess_uint8(jnp.asarray(img)))[0, 0])

    import pandas as pd
    import pickle

    zmat = np.asarray(z_final).reshape(len(images), -1)
    df = pd.DataFrame(np.concatenate(
        [zmat, np.zeros((len(zmat), 1), zmat.dtype)], axis=1))
    lab = np.zeros(len(zmat)) if labels is None else np.asarray(labels)[:len(zmat)]
    # column (not iloc) assignment so the label column really becomes uint8
    # like the reference's .astype('uint8') (regularize_inverter.py:188)
    df[df.columns[-1]] = lab.astype(np.uint8)
    with open(ctx.run.interim_dir / "particles_position_ood.pkl", "wb") as f:
        pickle.dump(df, f)


def run_regularize_inverter(ctx: StageContext, gen_params, gen_state, enc_params,
                            images, iterations: int = 500, num_vis: int = 10,
                            labels=None):
    """Per-image gradient descent on z (reference regularize_inverter.py via
    util_inverter.invert:544-638), batched. num_vis reconstruction
    snapshots decode post-hoc from the recorded z trajectory — the
    reference's `synthetic_images_{step}.png` grids (:622-624) without
    breaking the fused scan."""
    z, hist = invert(images, gen_params, gen_state, enc_params,
                     iterations=iterations, record_z=num_vis > 0)
    z_hist = hist.pop("z", None)
    reporting.plot_training_curves(
        {k: list(v) for k, v in hist.items()},
        ctx.run.reports_dir / "invert_loss.png",
    )
    # the reference's combined component figure (util_report_inverter.py:76-84)
    reporting.plot_regularize_inverter_losses(
        hist, ctx.run.reports_dir / "regularize_inverter_losses.png")
    if z_hist is not None and num_vis > 0:
        from gan_discovery_pso_tpu.models.dcgan import generator_apply

        every = max(iterations // num_vis, 1)
        for step in range(0, iterations + 1, every):
            x_rec, _ = generator_apply(
                gen_params, gen_state, jnp.asarray(z_hist[min(step, len(z_hist) - 1)]),
                train=False)
            # reference show_gan_images superimage of the current inversions
            # (util_inverter.py:622-624)
            reporting.superimage(
                np.asarray(x_rec),
                ctx.run.general_dir / f"synthetic_images_{step}.png",
                drange=(-1, 1))
    np.savez_compressed(ctx.run.interim_dir / "inverted_z.npz", z=np.asarray(z))
    _regularize_snapshots_and_pickle(ctx, gen_params, gen_state, enc_params,
                                     images, z, labels)
    ctx.run.write_timing({})  # (reference regularize_inverter.py:195-200)
    ctx.run.write_overall_history({k: list(v) for k, v in hist.items()})
    return z, hist


def run_regularize_inverter_statistics(
    ctx: StageContext, gen_params, gen_state, enc_params, images,
    pso_interim_dir, classes=None, iterations: int = 500, labels=None,
):
    """z-statistics variant: normalize against PSO particle populations
    (reference regularize_inverter_statistics.py + invert_bn)."""
    classes = classes if classes is not None else ctx.data_cfg.iid_classes
    parts = np.stack(
        [load_final_particle_positions(pso_interim_dir, c, "iid") for c in classes]
    )
    z, w, hist = invert_bn(
        images, gen_params, gen_state, enc_params, jnp.asarray(parts),
        iterations=iterations, key=ctx.keys("invert_bn"),
    )
    reporting.plot_training_curves(
        {k: list(v) for k, v in hist.items()},
        ctx.run.reports_dir / "invert_bn_loss.png",
    )
    reporting.plot_regularize_inverter_losses(
        hist, ctx.run.reports_dir / "regularize_inverter_losses.png")
    np.savez_compressed(
        ctx.run.interim_dir / "inverted_bn_z.npz", z=np.asarray(z), weights=np.asarray(w)
    )
    _regularize_snapshots_and_pickle(ctx, gen_params, gen_state, enc_params,
                                     images, z, labels)
    ctx.run.write_timing({})
    ctx.run.write_overall_history({k: list(v) for k, v in hist.items()})
    return z, w, hist


# ---------------------------------------------------------------------------
# VQ-VAE stage (reference src/training/vq_vae.py)
# ---------------------------------------------------------------------------


def run_vqvae(
    ctx: StageContext,
    gen_params,
    gen_state,
    pso_interim_dir=None,
    epochs: int | None = None,
):
    cfg = ctx.cfg
    d = VQVAEGanDef(
        channels_img=ctx.data_cfg.channel,
        embedded_dim=int(cfg.model.latent_space.embedding_dim),
        num_embedding=int(cfg.model.latent_space.num_embedding),
        features_g=int(cfg.model_gan.network.units_gen),
        features_d=int(cfg.model_gan.network.units_disc),
    )
    adam = AdamConfig.from_config(cfg.trainer.optimizer)
    beta = float(cfg.trainer.beta)
    bs = int(cfg.trainer.batch_size)
    epochs = epochs if epochs is not None else int(cfg.trainer.epochs)

    # codebook from PSO particle positions of all iid classes
    # (reference vq_vae.py:30-57: 32 particles/class × 8 classes = 256)
    data_pso = None
    if pso_interim_dir is not None:
        rows = [
            load_final_particle_positions(pso_interim_dir, c, "iid")
            for c in ctx.data_cfg.iid_classes
        ]
        data_pso = np.concatenate(rows, axis=0)[: d.num_embedding]
        if data_pso.shape[1] != d.embedded_dim:
            # The reference only works because its configs keep
            # trainer_pso.dim_space == model.latent_space.embedding_dim
            # (vq_vae.py:44-47 reads the pickle at the cfg dims); diagnose
            # the drift here instead of failing inside the jitted VQ lookup.
            raise ValueError(
                f"PSO particles in {pso_interim_dir} have dim "
                f"{data_pso.shape[1]} but model.latent_space.embedding_dim="
                f"{d.embedded_dim} — set embedding_dim to the discovery "
                "run's trainer_pso.dim_space (the codebook IS those "
                "particle positions)"
            )
    gen_z_dim = gen_params["convt1"]["w"].shape[0]  # IOHW: in-channels
    if gen_z_dim != d.embedded_dim:
        raise ValueError(
            f"frozen decoder expects z_dim={gen_z_dim} inputs but "
            f"model.latent_space.embedding_dim={d.embedded_dim} — the "
            "vqvae_dcgan decoder IS the pretrained G, so embedding_dim "
            "must equal the GAN run's trainer_gan.z_dim"
        )

    state, _tx = vqvae_init(ctx.keys("vqvae"), d, adam, data_pso=data_pso,
                            frozen_gen=(gen_params, gen_state))

    iid = ctx.dataset("train", drange=(-1, 1))
    val_iid = ctx.dataset("test", drange=(-1, 1))
    val_ood = ctx.dataset("test", classes=ctx.data_cfg.ood_classes, drange=(-1, 1))

    from gan_discovery_pso_tpu.models import vqvae_gan_apply

    recon = jax.jit(lambda p, s, x: vqvae_gan_apply(p, s, x, d, train=False)[0])

    def report_cb(epoch, st):
        # per-epoch original-vs-reconstruction panels for the three splits
        # (reference vq_vae.py:221-227 show_images → img_loss_{phase}_{e+1})
        for phase, split in (("train", iid), ("val_ood", val_ood),
                             ("val_iid", val_iid)):
            if len(split.images) == 0:
                continue
            x = jnp.asarray(np.asarray(split.images[:10]))
            xr = np.asarray(recon(st.params, st.model_state, x))
            reporting.recon_panel(
                np.asarray(x), xr,
                ctx.run.general_dir / f"img_loss_{phase}_{epoch + 1}.png")
        # per-epoch decoder samples from FIXED noise + per-epoch model
        # checkpoint (reference vq_vae.py:234 show_gan_images and :244-245
        # model_{e+1}.pt — the per-epoch file is the resume/inspection
        # contract; best_vqvae is saved after training like best_{e+1}.pt)
        from gan_discovery_pso_tpu.models.dcgan import generator_apply

        synth, _ = generator_apply(st.params["decoder"],
                                   st.model_state["decoder"], noise,
                                   train=False)
        # reference show_gan_images superimage layout (vqvae util_report.py
        # :36-76, written to general_reports_dir at vq_vae.py:234)
        reporting.superimage(
            np.asarray(synth),
            ctx.run.general_dir / f"synthetic_images_{epoch}.png",
            drange=(-1, 1))
        ctx.ckpt.save_state_dict(
            f"model_{epoch + 1}",
            {"params": st.params, "state": st.model_state})

    noise = jax.random.normal(ctx.keys("vqvae_fixed_noise"),
                              (32, d.embedded_dim, 1, 1), jnp.float32)
    state, history, best_epoch = train_vqvae(
        state, d, adam,
        ctx.batches(iid, bs), ctx.batches(val_iid, bs, drop_last=False), ctx.batches(val_ood, bs, drop_last=False),
        num_epochs=epochs, beta=beta,
        metrics_writer=ctx.metrics("history_vqvae"),
        report_cb=report_cb,
    )
    ctx.ckpt.save_best("vqvae", best_epoch,
                       {"params": state.params, "state": state.model_state})
    reporting.plot_training_curves(history, ctx.run.reports_dir / "vqvae_training.png")
    # per-component figures in the reference layout (utils_vq_vae/
    # util_report.py:13-36 → training_plot/{reconstruction_loss,vq_loss}.png)
    reporting.plot_vqvae_losses(history, ctx.run.plot_dir)
    ctx.run.write_timing({})  # (reference vq_vae.py:247-257)
    # vq_vae.py:256-257 dumps overall_history.pkl too — the reference leaves
    # it an empty dict (history never flows in); we write the real history
    ctx.run.write_overall_history(history)
    return state, history, d


# ---------------------------------------------------------------------------
# PixelCNN prior stage (completes SURVEY §2 row 12's GatedPixelCNN — the
# reference ships the model but never trains it; here it gets a real stage)
# ---------------------------------------------------------------------------


def run_pixelcnn_prior_from_vqvae(
    ctx: StageContext,
    vqvae_model_dir: str | Path,
    epochs: int | None = None,
    batch_size: int = 256,
):
    """CLI-facing wrapper: load a trained `vqvae` run, encode the training
    set to codebook indices, and train the Gated PixelCNN prior over them
    (the reference ships GatedPixelCNN, utils_vq_vae/util_model.py:391-448,
    but never wires a training entry — this leg completes it)."""
    from gan_discovery_pso_tpu.core.checkpoint import load_pytree, restore_tree
    from gan_discovery_pso_tpu.models import vqvae_gan_encode_indices

    cfg = ctx.cfg
    ck = load_pytree(Path(vqvae_model_dir) / "best_vqvae.msgpack")
    st = restore_tree(ck["state"])
    params, model_state = st["params"], st["state"]
    # Derive latent dims from the CHECKPOINT's codebook, not the current
    # config: a prior trained at config dims against a tiny-run vqvae would
    # silently cover codes the vqvae doesn't have (or crash in the encode
    # jit). The conv widths still come from config — validated by shape
    # against the checkpoint's encoder stem.
    num_embedding, embedded_dim = (int(x) for x in params["codebook"].shape)
    d = VQVAEGanDef(
        channels_img=ctx.data_cfg.channel,
        embedded_dim=embedded_dim,
        num_embedding=num_embedding,
        features_g=int(cfg.model_gan.network.units_gen),
        features_d=int(cfg.model_gan.network.units_disc),
    )
    ck_f = params["encoder"]["conv1"]["w"].shape[0]  # OIHW out-channels
    if ck_f != d.features_d:
        raise ValueError(
            f"{vqvae_model_dir}/best_vqvae.msgpack was trained with "
            f"features_d={ck_f} but the config says units_disc="
            f"{d.features_d} — pass the same config (and --tiny flag) the "
            "vqvae run used"
        )

    ds = ctx.dataset("train", drange=(-1, 1))
    enc = jax.jit(lambda x: vqvae_gan_encode_indices(params, model_state, x, d))
    idx_batches = []
    imgs = np.asarray(ds.images)
    for b in range(0, len(imgs), batch_size):
        idx_batches.append(np.asarray(enc(jnp.asarray(imgs[b : b + batch_size]))))
    indices = np.concatenate(idx_batches, axis=0)
    labels = np.asarray(ds.labels, np.int64)

    epochs = epochs if epochs is not None else 10
    return run_pixelcnn_prior(
        ctx, indices, labels,
        num_embedding=d.num_embedding,
        n_classes=int(labels.max()) + 1,
        epochs=epochs,
        batch_size=min(batch_size, len(labels)),
    )


def run_pixelcnn_prior(
    ctx: StageContext,
    indices,
    labels,
    num_embedding: int,
    n_classes: int,
    epochs: int = 10,
    batch_size: int = 128,
    dim: int = 64,
    n_layers: int = 8,
    lr: float = 3e-4,
):
    """Train the class-conditioned Gated PixelCNN prior over VQ-VAE codebook
    indices (reference GatedPixelCNN, utils_vq_vae/util_model.py:391-448).

    indices: [N, H, W] int codebook assignments (from
    models.vqvae_gan_encode_indices / the `vqvae` variant's encode);
    labels: [N] int class labels. Saves pixelcnn.msgpack + loss curve.
    """
    import optax

    from gan_discovery_pso_tpu.models import (
        PixelCNNDef,
        pixelcnn_init,
        pixelcnn_loss,
    )

    d = PixelCNNDef(input_dim=num_embedding, dim=dim, n_layers=n_layers,
                    n_classes=n_classes)
    params = jit_init(pixelcnn_init, d)(ctx.keys("pixelcnn"))
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, idx, lab):
        loss, grads = jax.value_and_grad(pixelcnn_loss)(params, d, idx, lab)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    indices = jnp.asarray(indices, jnp.int32)
    labels = jnp.asarray(labels, jnp.int32)
    n = indices.shape[0]
    history = {"train_loss": []}
    mw = ctx.metrics("history_pixelcnn")
    for epoch in range(epochs):
        perm = np.asarray(jax.random.permutation(ctx.keys.peek(f"pix_ep_{epoch}"), n))
        losses = []
        for b in range(0, n - batch_size + 1, batch_size):
            sel = perm[b : b + batch_size]
            params, opt, loss = step(params, opt, indices[sel], labels[sel])
            losses.append(float(loss))
        tr = float(np.mean(losses)) if losses else float("nan")
        history["train_loss"].append(tr)
        mw.append(epoch, train_loss=tr)
    ctx.ckpt.save_state_dict("pixelcnn", {"params": params, "def": d._asdict()})
    reporting.plot_training_curves(history, ctx.run.reports_dir / "pixelcnn_training.png")
    mw.close()
    return params, d, history

"""PSO discovery stage — the flagship pipeline.

Per IiD class: load the trained generator + assessor, run the fused swarm
optimize on device, then emit the reference's artifact set in the
reference's directory layout (reference src/training/pso_discovery.py:174-254):

- `interim/particles_position_iid_class_{label}.pkl` (+ `iic` alias) + npz,
- `general/{label}/pso_iter.png`, `mean_mse.png` (convergence + diagnostics,
  :223-224), `fitness_grid.pkl` + `img_grid.pkl` at dim 2 (:228-231),
- `training_plot/{label}/pso_dim_{d}.png`, `pso_dim_last_iteration.png`
  (:234-235), `2d_plot_{i}.png` + `2dspace_latent.gif` when dim_space == 2
  (:226-232 — the mesh is ONE batched device call here, not 10k batch-1
  forwards), `pso_images_{i}.png` + `iid_img.gif` (:237, util_pso.py:127-133),
- `general/timing.pkl` / `timing.json` + `overall_history.pkl` (:246-251).

Unlike the reference's sequential host loop over classes, classes can run
as independent swarms; cross-class parallelism is available through
parallel.make_multi_swarm_optimize when assessor params are stacked.
"""

from __future__ import annotations

import pickle
import time
import jax
import jax.numpy as jnp
import numpy as np

from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.models.resnet import ResNetDef
from gan_discovery_pso_tpu.pipelines.context import StageContext
from gan_discovery_pso_tpu.pso import (
    OPTIMIZE_OUT,
    SwarmResult,
    make_discovery_fitness_dynamic,
    save_particle_histories,
)
from gan_discovery_pso_tpu.analysis import reporting


def run_pso_discovery(
    ctx: StageContext,
    gen_params,
    gen_state,
    cnn_params,
    cnn_state,
    cnn_def: ResNetDef,
    classes=None,
    control: str = OPTIMIZE_OUT,
    threshold: float = 0.0,
    make_plots: bool = True,
    batch_classes: bool = False,
    image_grids: bool = True,
    tensorboard: bool = False,
    shard_devices: int | None = None,
) -> dict:
    """Returns {class_label: SwarmResult}. Models are passed in (the CLI
    layer resolves them from prerequisite run dirs).

    batch_classes=True advances ALL per-class swarms in lockstep as one
    vmapped device program (every iteration batches n_classes × n_particles
    fitness forwards) — the TPU-native replacement for the reference's
    sequential per-class host loop (src/training/pso_discovery.py:174);
    see run_pso_discovery_batched.

    shard_devices=N shards the particle axis over an N-device mesh (GSPMD
    global-best all-reduce per iteration, parallel/swarm_sharding.py) while
    emitting the SAME artifact contract as the default path — timing.json,
    pickles, convergence/landscape plots, image grids."""
    if batch_classes and shard_devices:
        raise ValueError("batch_classes and shard_devices are mutually exclusive")
    if batch_classes:
        return run_pso_discovery_batched(
            ctx, gen_params, gen_state, cnn_params, cnn_state, cnn_def,
            classes=classes, control=control, threshold=threshold,
            make_plots=make_plots, image_grids=image_grids,
            tensorboard=tensorboard,
        )
    hp = PsoConfig.from_config(ctx.cfg.trainer_pso)
    if classes is None:
        classes = ctx.data_cfg.iid_classes
    c2i = cnn_def.class_to_idx()

    ctx.notify("pso_discovery_start", classes=list(classes), hp=repr(hp))
    results: dict = {}
    timings: dict = {}
    overall_history: dict = {}
    # params AND class index are runtime args: ONE compiled optimize serves
    # every class of this sweep and every future model of the same shapes
    from gan_discovery_pso_tpu.pso import make_discovery_runner

    run = make_discovery_runner(cnn_def, hp, control=control, threshold=threshold)
    fitness_dyn = make_discovery_fitness_dynamic(
        gen_params, gen_state, cnn_params, cnn_state, cnn_def,
        control=control, threshold=threshold,
    )  # host-side landscape plots reuse this closure
    tb_writer = (
        ctx.metrics("img_pso", tensorboard=True) if tensorboard else None
    )
    run_sharded = None
    if shard_devices:
        from gan_discovery_pso_tpu.parallel import (
            make_mesh,
            make_sharded_discovery_runner,
        )

        # params + class_idx are jit arguments: ONE compile for all classes
        run_sharded = make_sharded_discovery_runner(
            make_mesh(shard_devices, "swarm"), cnn_def, hp,
            control=control, threshold=threshold,
        )
    # Dispatch EVERY class's optimize before collecting any: the swarms are
    # independent (reference semantics — they never communicate), so JAX
    # async dispatch keeps the device queue full across classes instead of
    # paying one tunnel round-trip per class, and the host-side artifact
    # emission below overlaps with later classes' device compute.
    runner = run_sharded if run_sharded is not None else run
    t_start = time.time()
    dispatched = []
    for label in classes:
        key = ctx.keys.child(f"class_{label}")("pso")
        dispatched.append((label, runner(
            key, gen_params, gen_state, cnn_params, cnn_state,
            jnp.asarray(c2i.get(label, 1), jnp.int32),
        )))
    for label, (final, hist, init) in dispatched:
        fitness = lambda pos, ci=c2i.get(label, 1): fitness_dyn(pos, ci)
        res = SwarmResult(final, hist, init, hp)
        # a real result transfer is the completion barrier (the backend's
        # block_until_ready can return early — see bench.py); executions
        # complete in dispatch order, so this also covers earlier classes
        float(res.g_best_val)
        results[label] = res
        # time-to-ready since the sweep began (classes overlap on device,
        # so per-class wall-clock deltas are no longer meaningful alone)
        timings[f"training_time_class_{label}"] = time.time() - t_start

        # --- artifacts (reference :222-240)
        save_particle_histories(
            ctx.run.interim_dir, label,
            res.particle_trajectories(), res.velocity_trajectories(), kind="iid",
        )
        overall_history[f"class_{label}"] = res.history_dict()
        if make_plots:
            emit_swarm_reports(
                ctx, res, label, gen_params, gen_state,
                fitness=fitness, title=f"class {label}",
            )
        if image_grids:
            render_swarm_grids(
                ctx, gen_params, gen_state, res, label, writer=tb_writer
            )
        print(
            f"[pso_discovery] class {label}: g_best={float(res.g_best_val):.5f} "
            f"iters={res.last_iteration} in {timings[f'training_time_class_{label}']:.1f}s"
        )

    ctx.run.write_timing(timings)
    _write_overall_history(ctx, overall_history)
    if tb_writer is not None:
        tb_writer.close()
    ctx.notify("pso_discovery_done")
    return results


def run_pso_discovery_batched(
    ctx: StageContext,
    gen_params,
    gen_state,
    cnn_params,
    cnn_state,
    cnn_def: ResNetDef,
    classes=None,
    control: str = OPTIMIZE_OUT,
    threshold: float = 0.0,
    make_plots: bool = True,
    fast_math_dtype=None,
    image_grids: bool = True,
    tensorboard: bool = False,
) -> dict:
    """All class swarms in one vmapped optimize: G/assessor forwards batch
    [n_classes · n_particles] per iteration, amortizing small-op overhead
    across the sweep. Swarms stay fully independent (vmap axis), preserving
    the reference's never-communicating-swarms semantics (SURVEY.md §5.8)."""
    import time as _time

    hp = PsoConfig.from_config(ctx.cfg.trainer_pso)
    if classes is None:
        classes = ctx.data_cfg.iid_classes
    c2i = cnn_def.class_to_idx()
    idxs = jnp.asarray([c2i.get(c, 1) for c in classes], jnp.int32)

    tb_writer = (
        ctx.metrics("img_pso", tensorboard=True) if tensorboard else None
    )

    # params are jit ARGUMENTS (pso/runner.py): one compiled executable
    # serves every model of the same shapes across sweeps
    from gan_discovery_pso_tpu.pso import (
        make_batched_discovery_runner,
        make_chunked_batched_discovery_runner,
        resolve_fitness_chunk,
        select_program,
    )

    # HBM-streaming chunking for large swarms, ON BY DEFAULT at >=256
    # particles ('auto' in the shipped config; override with --set
    # trainer_pso.fitness_chunk=N or =0): evaluate each swarm's fitness in
    # sequential in-program chunks — identical values (pso/runner.py), keeps
    # assessor residual activations at the streaming size when
    # n_classes*n_particles forwards would otherwise spill (docs/BENCH.md
    # round-4 tp_chunk: +49% evals/s, bit-identical g_best)
    fitness_chunk = resolve_fitness_chunk(
        ctx.cfg.trainer_pso.get("fitness_chunk", "auto"), hp.n_particles)
    kw = dict(control=control, threshold=threshold, dtype=fast_math_dtype,
              fitness_chunk=fitness_chunk)
    # fp32 (HIGHEST-precision) 50-iteration monoliths compile superlinearly
    # in program length on this backend (316-506 s cold vs 38 s for a
    # 10-iteration chunk chain with the IDENTICAL trajectory — docs/BENCH.md
    # compile_bisect + round-5). pso/runner.select_program defaults the cold
    # parity path to the chunked program; --set trainer_pso.program=
    # monolithic|chunked forces either.
    chunk = select_program(str(ctx.cfg.trainer_pso.get("program", "auto")),
                           hp, fast_math_dtype is not None)
    if chunk:
        run = make_chunked_batched_discovery_runner(cnn_def, hp, chunk, **kw)
    else:
        run = make_batched_discovery_runner(cnn_def, hp, **kw)
    keys = jnp.stack([
        ctx.keys.child(f"class_{label}")("pso") for label in classes
    ])

    def call():
        return run(keys, gen_params, gen_state, cnn_params, cnn_state, idxs)

    t0 = _time.time()
    if fast_math_dtype is not None:
        from gan_discovery_pso_tpu.ops.precision import fast_math

        with fast_math():  # tracing happens on first call — keep it inside
            finals, hists, inits = call()
    else:
        finals, hists, inits = call()
    # real result transfer as the completion barrier (block_until_ready can
    # return early on this backend — see bench.py)
    np.asarray(finals.g_best_val)
    wall = _time.time() - t0

    fitness_dyn = None
    if make_plots and hp.dim_space == 2:
        fitness_dyn = make_discovery_fitness_dynamic(
            gen_params, gen_state, cnn_params, cnn_state, cnn_def,
            control=control, threshold=threshold,
        )

    results: dict = {}
    overall_history: dict = {}
    for i, label in enumerate(classes):
        res = SwarmResult(
            jax.tree.map(lambda a, i=i: a[i], finals),
            jax.tree.map(lambda a, i=i: a[i], hists),
            jax.tree.map(lambda a, i=i: a[i], inits),
            hp,
        )
        results[label] = res
        save_particle_histories(
            ctx.run.interim_dir, label,
            res.particle_trajectories(), res.velocity_trajectories(), kind="iid",
        )
        overall_history[f"class_{label}"] = res.history_dict()
        if make_plots:
            fitness = (
                None if fitness_dyn is None
                else (lambda pos, ci=c2i.get(label, 1): fitness_dyn(pos, ci))
            )
            emit_swarm_reports(
                ctx, res, label, gen_params, gen_state,
                fitness=fitness, title=f"class {label}",
            )
        if image_grids:
            render_swarm_grids(
                ctx, gen_params, gen_state, res, label, writer=tb_writer
            )
        print(
            f"[pso_discovery/batched] class {label}: "
            f"g_best={float(res.g_best_val):.5f} iters={res.last_iteration}"
        )
    if tb_writer is not None:
        tb_writer.close()
    ctx.run.write_timing({"training_time_all_classes": wall})
    _write_overall_history(ctx, overall_history)
    print(f"[pso_discovery/batched] {len(classes)} swarms in {wall:.2f}s wall")
    return results


_GEN_FWD_JIT = None


def _jitted_generator_forward():
    """One shared jitted G forward for the grid renderer: per-class calls of
    the same shapes reuse ONE executable instead of re-jitting per label."""
    global _GEN_FWD_JIT
    if _GEN_FWD_JIT is None:
        from gan_discovery_pso_tpu.models.dcgan import generator_forward

        _GEN_FWD_JIT = jax.jit(generator_forward)
    return _GEN_FWD_JIT


def render_swarm_grids(
    ctx: StageContext,
    gen_params,
    gen_state,
    res: SwarmResult,
    label,
    writer=None,
    ncols: int = 8,
    tag: str | None = None,
):
    """Per-iteration generated-image grids, rendered POST-HOC.

    The reference renders every particle's generated image inside
    update_personal_best each iteration → `training_plot/{label}/
    pso_images_{i}.png` + a TB image (reference src/pso/util_pso.py:114-133,
    src/training/pso_discovery.py:166-179). Rendering inside the fused
    lax.scan would break the single-device-program design, so the same
    images are re-generated here from the recorded trajectories: the
    positions fitness was evaluated at on iteration i are the PRE-move
    positions, i.e. trajectory row i-1 — ONE batched G forward covers every
    recorded iteration."""
    out_dir = ctx.run.reports_dir / "training_plot" / str(label)
    out_dir.mkdir(parents=True, exist_ok=True)
    traj = res.particle_trajectories()  # [n_act+1, N, d]
    pre_move = traj[:-1]  # eval positions of iterations 1..n_act
    n_it, n_p, d = pre_move.shape
    if n_it == 0:
        return []
    z = jnp.asarray(pre_move.reshape(n_it * n_p, d, 1, 1), jnp.float32)
    imgs = np.asarray(_jitted_generator_forward()(gen_params, gen_state, z))
    imgs = imgs.reshape(n_it, n_p, *imgs.shape[1:])
    paths = []
    for i in range(n_it):
        # G output is tanh → drange (-1, 1), like the reference's particles
        paths.append(
            reporting.save_image_grid(
                imgs[i], out_dir / f"pso_images_{i + 1}.png",
                ncols=ncols, drange=(-1, 1),
            )
        )
        if writer is not None:
            # reference tags the grid "Real" in a PER-CLASS writer
            # (util_pso.py:70,133); one shared writer here, so the class
            # goes into the tag to keep the streams from colliding
            writer.add_image(
                tag if tag is not None else f"Real/class_{label}",
                reporting.grid_canvas(imgs[i], ncols=ncols, drange=(-1, 1)),
                step=i + 1,
            )
    # the reference assembles the grids into a GIF after optimize
    # (make_gif_from_folder's defaults: pso_images_* → iid_img.gif,
    # util_report.py:75-79, pso_discovery.py:237)
    reporting.make_gif(paths, out_dir / "iid_img.gif")
    return paths


def emit_swarm_reports(
    ctx: StageContext,
    res: SwarmResult,
    sub,
    gen_params,
    gen_state,
    fitness=None,
    title: str = "",
    resolution: int = 100,
    span: float = 5.0,
    save_img_grid: bool = True,
):
    """The reference's per-swarm report set, in the reference layout
    (reference src/training/pso_discovery.py:222-237,
    src/training/pso_inverter.py:326-340):

    - `general/{sub}/pso_iter.png` (plot_pso_convergence, util_report.py:23-29)
    - `general/{sub}/mean_mse.png` (the mean_mse branch of plot_training)
    - `training_plot/{sub}/pso_dim_{d}.png` + `pso_dim_last_iteration.png`
      (plot_feature / plot_features_last_iteration, util_report.py:36-73)
    - at dim_space == 2 with a fitness closure: `training_plot/{sub}/
      2d_plot_{i}.png` frames + `2dspace_latent.gif`, and
      `general/{sub}/fitness_grid.pkl` + `img_grid.pkl` (plot2d,
      util_report.py:82-141 — mesh fitness is ONE batched device call).

    Plots use the positions fitness was EVALUATED at (trajectory rows
    :-1) — exactly the rows the reference's Particle.history records
    (appended in update_personal_best, pre-move; util_pso.py:114-133).
    """
    general = ctx.run.reports_dir / "general" / str(sub)
    plots = ctx.run.reports_dir / "training_plot" / str(sub)
    general.mkdir(parents=True, exist_ok=True)
    plots.mkdir(parents=True, exist_ok=True)

    hd = res.history_dict()
    reporting.plot_convergence(
        hd["global_best_val"], general / "pso_iter.png",
        title=title or f"swarm {sub}",
    )
    reporting.plot_mean_mse(hd["mean_mse"], general / "mean_mse.png")

    eval_rows = res.particle_trajectories()[:-1]  # [n_act, N, d]
    reporting.plot_particle_dimensions(eval_rows, plots, prefix="pso_dim")
    reporting.plot_particles_last_iteration(
        eval_rows[-1], plots / "pso_dim_last_iteration.png"
    )
    if res.hp.dim_space == 2 and fitness is not None:
        _emit_landscape(
            res, fitness, gen_params, gen_state, general, plots,
            resolution=resolution, span=span, save_img_grid=save_img_grid,
        )
    return general, plots


def _emit_landscape(
    res: SwarmResult,
    fitness,
    gen_params,
    gen_state,
    general,
    plots,
    resolution: int = 100,
    span: float = 5.0,
    save_img_grid: bool = True,
):
    """2-D fitness landscape artifacts (reference plot2d,
    util_report.py:82-141 + pso_discovery.py:226-232): the contour mesh
    spans g_best ± span (reference: ±5 at step 0.1 → 100 points/axis),
    its fitness is evaluated in ONE device call (the reference runs 10k
    batch-1 G+CNN forwards), every recorded iteration gets a
    `2d_plot_{i}.png` frame, and the grid fitness / generated images are
    pickled (`fitness_grid.pkl`, `img_grid.pkl`)."""
    center = np.asarray(res.g_best_pos)
    xs = np.linspace(center[0] - span, center[0] + span, resolution)
    ys = np.linspace(center[1] - span, center[1] + span, resolution)
    gx, gy = np.meshgrid(xs, ys)
    mesh = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float32)
    z_grid = np.asarray(fitness(jnp.asarray(mesh))).reshape(resolution, resolution)
    with open(general / "fitness_grid.pkl", "wb") as f:
        pickle.dump(z_grid, f)
    if save_img_grid:
        # the generated image at every mesh point, rescaled per-sample to
        # [0,1] like Discovery.particles_to_img (util_discovery.py:33-50);
        # float16 halves the pickle without visible loss
        from gan_discovery_pso_tpu.ops import rescale01_per_sample

        z = jnp.asarray(mesh.reshape(len(mesh), 2, 1, 1))
        imgs = _jitted_generator_forward()(gen_params, gen_state, z)
        imgs01 = np.asarray(rescale01_per_sample(imgs), np.float16)
        with open(general / "img_grid.pkl", "wb") as f:
            pickle.dump(imgs01, f)

    # every frame reuses the one evaluated grid
    serve = lambda _mesh: z_grid.ravel()  # noqa: E731
    eval_rows = res.particle_trajectories()[:-1]
    frames = []
    for it in range(eval_rows.shape[0]):
        frames.append(
            reporting.plot_fitness_landscape_2d(
                serve,
                center=center,
                out_path=plots / f"2d_plot_{it}.png",
                positions=eval_rows[it],
                span=span,
                resolution=resolution,
            )
        )
    reporting.make_gif(frames, plots / "2dspace_latent.gif")


def _write_overall_history(ctx: StageContext, overall_history: dict):
    """`general/overall_history.pkl` (reference pso_discovery.py:250-251)
    + a readable JSON twin."""
    import json

    general = ctx.run.reports_dir / "general"
    general.mkdir(parents=True, exist_ok=True)
    ctx.run.write_overall_history(overall_history)
    with open(general / "overall_history.json", "w") as f:
        json.dump(
            {k: {kk: [float(x) for x in vv] for kk, vv in v.items()}
             for k, v in overall_history.items()},
            f, indent=2,
        )

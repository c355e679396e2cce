"""One-shot TPU A/B experiments behind BENCH.md (VERDICT r2 items 2/3/4/8).

Runs each leg sequentially on the real TPU (one holder at a time — never run
while tools/run_experiment.py or bench.py holds the tunnel), appends one JSON
line per measurement to experiments/bench_ab.jsonl, and prints progress to
stderr. Every leg is independently guarded; a failing leg records its error
and the script moves on.

Legs (select by name on argv; default = all):
  compile_bisect   — COLD-compile wall time of the batched fp32 runner under
                     {HIGHEST x 50it, HIGHEST x 5it, HIGH x 50it, HIGHEST x
                     50it single-class}: which axis causes the 522.9 s cold
                     compile (BENCH_r02)? Each case runs in a subprocess with
                     a fresh compilation-cache dir so nothing is warm.
  tp_chunk         — throughput mode (8c x 256p bf16) with fitness_chunk in
                     {None, 32, 64, 128}: the in-program particle-chunked
                     scan meant to restore activation HBM streaming
                     (docs/BENCH.md "where the time goes").
  lowp_io          — flagship + throughput mode traced under precision.
                     lowp_io(): ResNet/G activations stay bf16 end-to-end
                     (half the HBM traffic of the f32-accumulation recipe);
                     reports the g_best drift vs the normal bf16 path so the
                     parity gate can judge it.
  pallas           — flagship shape with use_pallas=True vs False (the fused
                     Pallas swarm-update iteration, ops/pallas/swarm_update).
  train_bf16       — DCGAN fused train step: fp32(fast_math) vs
                     compute_dtype=bf16 at batch 128, imgs/s + MFU via XLA
                     cost analysis + a 30-step loss-trajectory gate.

Measurement protocol == bench.py: pipelined dispatch, barriered by a real
host transfer of the last result (block_until_ready is not trustworthy on
this tunnel backend), fresh fold_in salts per call so runtime memoization
cannot serve cached outputs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
# invoked as `python tools/bench_ab.py`: sys.path[0] is tools/, not the
# repo root — the in-process legs need the package importable.
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
OUT = REPO / "experiments" / "bench_ab.jsonl"
PEAK_FLOPS = float(os.environ.get("GDPT_TPU_PEAK_FLOPS", 197e12))

N_PARTICLES = 32
N_ITERATIONS = 50
N_CLASSES = 8
DIM = 100


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def record(leg: str, **kw):
    OUT.parent.mkdir(exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps({"leg": leg, **kw}) + "\n")
    log(f"[bench_ab] {leg}: {kw}")


# --------------------------------------------------------------------------
# compile_bisect — subprocess per case, fresh cache dir
# --------------------------------------------------------------------------

_BISECT_SNIPPET = r"""
import json, os, sys, time
case = json.loads(sys.argv[1])
# BEFORE the package import: core/__init__.py resets the compile-cache dir
# to GDPT_COMPILE_CACHE (default /tmp/jax_cache) at import time, which
# would silently clobber a jax.config.update made here.
os.environ["GDPT_COMPILE_CACHE"] = case["cache_dir"]
import jax, jax.numpy as jnp, numpy as np
from gan_discovery_pso_tpu.core import seed_all, jit_init
from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.models import GeneratorDef, ResNetDef, generator_init, resnet_init
from gan_discovery_pso_tpu.ops.precision import precision_override
from gan_discovery_pso_tpu.pso import make_batched_discovery_runner
from jax import lax

keys = seed_all(42)
gp, gs = jit_init(generator_init, GeneratorDef(z_dim=100))(keys("g"))
rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
rp, rs = jit_init(resnet_init, rdef, init="glorot_normal")(keys("r"))
n_classes = case["n_classes"]
hp = PsoConfig(n_iterations=case["n_iterations"], n_particles=32, dim_space=100)
class_idxs = jnp.arange(n_classes, dtype=jnp.int32)
swarm_keys = jnp.stack([keys(f"pso_{c}") for c in range(n_classes)])
if case.get("chunk"):
    from gan_discovery_pso_tpu.pso import make_chunked_batched_discovery_runner
    run = make_chunked_batched_discovery_runner(rdef, hp, chunk=case["chunk"])
else:
    run = make_batched_discovery_runner(rdef, hp)
level = {"HIGHEST": lax.Precision.HIGHEST, "HIGH": lax.Precision.HIGH,
         "DEFAULT": lax.Precision.DEFAULT}[case["precision"]]
t0 = time.time()
with precision_override(level):
    out = run(swarm_keys, gp, gs, rp, rs, class_idxs)
g = np.asarray(out[0].g_best_val, np.float32)  # real-transfer barrier
wall = time.time() - t0
print(json.dumps({"compile_plus_first_s": round(wall, 1),
                  "g_best": [float(x) for x in g]}))
"""


def leg_compile_bisect():
    cases = [
        # name, precision, n_iterations, n_classes, host-chunk size
        ("HIGHEST_5it_8c", "HIGHEST", 5, 8, None),
        ("HIGH_50it_8c", "HIGH", 50, 8, None),
        ("HIGHEST_50it_1c", "HIGHEST", 50, 1, None),
        # the candidate fix: same trajectory, compiled as 10-iteration
        # programs dispatched 5x (make_chunked_batched_discovery_runner)
        ("HIGHEST_50it_8c_chunk10", "HIGHEST", 50, 8, 10),
    ]
    if os.environ.get("GDPT_BISECT_FULL"):
        cases.insert(0, ("HIGHEST_50it_8c", "HIGHEST", 50, 8, None))
    for name, prec, iters, ncls, chunk in cases:
        cache = f"/tmp/jax_cache_bisect_{name}"
        spec = json.dumps({"cache_dir": cache, "precision": prec,
                           "n_iterations": iters, "n_classes": ncls,
                           "chunk": chunk})
        log(f"[bench_ab] compile_bisect case {name} ...")
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "-c", _BISECT_SNIPPET, spec],
                capture_output=True, text=True, timeout=2400, cwd=REPO)
            if p.returncode == 0:
                res = json.loads(p.stdout.strip().splitlines()[-1])
                record("compile_bisect", case=name,
                       compile_plus_first_s=res["compile_plus_first_s"],
                       subprocess_wall_s=round(time.time() - t0, 1))
            else:
                record("compile_bisect", case=name, error=(
                    p.stderr.strip().splitlines() or ["?"])[-1])
        except subprocess.TimeoutExpired:
            record("compile_bisect", case=name, error="timeout 2400s")


# --------------------------------------------------------------------------
# shared in-process harness for the PSO legs
# --------------------------------------------------------------------------


def _setup():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from gan_discovery_pso_tpu.core import jit_init, seed_all
    from gan_discovery_pso_tpu.models import (GeneratorDef, ResNetDef,
                                              generator_init, resnet_init)

    keys = seed_all(42)
    gp, gs = jit_init(generator_init, GeneratorDef(z_dim=DIM))(keys("g"))
    rdef = ResNetDef("ResNet50", 1, N_CLASSES, (0, 2, 3, 4, 6, 7, 8, 9))
    rp, rs = jit_init(resnet_init, rdef, init="glorot_normal")(keys("r"))
    swarm_keys = jnp.stack([keys(f"pso_{c}") for c in range(N_CLASSES)])
    class_idxs = jnp.arange(N_CLASSES, dtype=jnp.int32)
    return keys, gp, gs, rdef, rp, rs, swarm_keys, class_idxs


def _measure_runner(run, swarm_keys, args, n_particles, lowp=False,
                    depth=12):
    """(sustained evals/s, g_best) with bench.py's barrier protocol."""
    import jax
    import numpy as np

    from gan_discovery_pso_tpu.ops.precision import fast_math, lowp_io

    def call(salt: int = 0):
        sk = jax.vmap(jax.random.fold_in, (0, None))(swarm_keys, salt)
        return run(sk, *args)

    def fetch(o):
        return np.asarray(o[0].g_best_val, np.float32)

    t0 = time.time()
    with fast_math(), lowp_io(lowp):
        out = call()
    g_best = fetch(out)
    log(f"    compile+first {time.time() - t0:.1f}s")
    fetch(call(1))  # warm single
    t0 = time.time()
    outs = [call(100 + i) for i in range(depth)]
    fetch(outs[-1])
    piped = (time.time() - t0) / depth
    evals = N_CLASSES * n_particles * N_ITERATIONS / piped
    return evals, g_best


def leg_tp_chunk():
    import jax.numpy as jnp

    from gan_discovery_pso_tpu.core.config import PsoConfig
    from gan_discovery_pso_tpu.pso import make_batched_discovery_runner

    keys, gp, gs, rdef, rp, rs, swarm_keys, class_idxs = _setup()
    hp256 = PsoConfig(n_iterations=N_ITERATIONS, n_particles=256, dim_space=DIM)
    args = (gp, gs, rp, rs, class_idxs)
    for chunk in (None, 32, 64, 128):
        log(f"[bench_ab] tp_chunk fitness_chunk={chunk} ...")
        try:
            run = make_batched_discovery_runner(
                rdef, hp256, dtype=jnp.bfloat16, fitness_chunk=chunk)
            evals, g = _measure_runner(run, swarm_keys, args, 256, depth=6)
            record("tp_chunk", fitness_chunk=chunk,
                   evals_per_sec=round(evals, 1),
                   g_best=[round(float(x), 6) for x in g])
        except Exception as e:
            record("tp_chunk", fitness_chunk=chunk, error=repr(e))


def leg_lowp_io():
    import jax.numpy as jnp
    import numpy as np

    from gan_discovery_pso_tpu.core.config import PsoConfig
    from gan_discovery_pso_tpu.pso import make_batched_discovery_runner

    keys, gp, gs, rdef, rp, rs, swarm_keys, class_idxs = _setup()
    args = (gp, gs, rp, rs, class_idxs)
    for n_p, label, depth in ((N_PARTICLES, "flagship_32p", 12),
                              (256, "throughput_256p", 6)):
        hp = PsoConfig(n_iterations=N_ITERATIONS, n_particles=n_p, dim_space=DIM)
        try:
            run = make_batched_discovery_runner(rdef, hp, dtype=jnp.bfloat16)
            log(f"[bench_ab] lowp_io {label} baseline ...")
            base_evals, base_g = _measure_runner(
                run, swarm_keys, args, n_p, lowp=False, depth=depth)
            # fresh runner: tracing is what bakes the lowp_io choice in
            run_l = make_batched_discovery_runner(rdef, hp, dtype=jnp.bfloat16,
                                                  rescale_impl="xla")
            log(f"[bench_ab] lowp_io {label} bf16-IO ...")
            lowp_evals, lowp_g = _measure_runner(
                run_l, swarm_keys, args, n_p, lowp=True, depth=depth)
            record("lowp_io", variant=label,
                   baseline_evals_per_sec=round(base_evals, 1),
                   lowp_evals_per_sec=round(lowp_evals, 1),
                   gbest_drift=float(np.max(np.abs(base_g - lowp_g))))
        except Exception as e:
            record("lowp_io", variant=label, error=repr(e))


def leg_pallas():
    import jax.numpy as jnp
    import numpy as np

    from gan_discovery_pso_tpu.core.config import PsoConfig
    from gan_discovery_pso_tpu.pso import make_batched_discovery_runner

    keys, gp, gs, rdef, rp, rs, swarm_keys, class_idxs = _setup()
    hp = PsoConfig(n_iterations=N_ITERATIONS, n_particles=N_PARTICLES,
                   dim_space=DIM)
    args = (gp, gs, rp, rs, class_idxs)
    try:
        base = make_batched_discovery_runner(rdef, hp, dtype=jnp.bfloat16)
        log("[bench_ab] pallas baseline ...")
        base_evals, base_g = _measure_runner(base, swarm_keys, args, N_PARTICLES)
        pal = make_batched_discovery_runner(rdef, hp, dtype=jnp.bfloat16,
                                            use_pallas=True)
        log("[bench_ab] pallas use_pallas=True ...")
        pal_evals, pal_g = _measure_runner(pal, swarm_keys, args, N_PARTICLES)
        record("pallas", baseline_evals_per_sec=round(base_evals, 1),
               pallas_evals_per_sec=round(pal_evals, 1),
               gbest_drift=float(np.max(np.abs(base_g - pal_g))))
    except Exception as e:
        record("pallas", error=repr(e))


def leg_train_bf16():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_discovery_pso_tpu.core.config import AdamConfig
    from gan_discovery_pso_tpu.models import DiscriminatorDef, GeneratorDef
    from gan_discovery_pso_tpu.ops.precision import fast_math
    from gan_discovery_pso_tpu.train import gan_init, make_gan_train_step

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from gan_discovery_pso_tpu.core import seed_all

    keys = seed_all(42)
    adam = AdamConfig(lr=1e-3, beta1=0.5, beta2=0.99)
    gdef = GeneratorDef(z_dim=DIM)
    state0, _ = gan_init(keys("gan"), gdef, DiscriminatorDef(), adam)
    bs = 128
    real = jax.random.uniform(keys("gan_real"), (bs, 1, 28, 28),
                              jnp.float32, -1.0, 1.0)

    def measure(step, label, n_steps=60):
        with fast_math():
            st, m = step(state0, real, jax.random.key(0))
        np.asarray(m["loss_gen"])
        t0 = time.time()
        for i in range(n_steps):
            st, m = step(st, real, jax.random.key(i))
        np.asarray(m["loss_gen"])  # in-order queue: one-RTT barrier
        dt = (time.time() - t0) / n_steps
        log(f"    {label}: {bs / dt:.0f} imgs/s ({dt * 1e3:.2f} ms/step)")
        return bs / dt

    def trajectory(step, n=30):
        st = state0
        tr = []
        for i in range(n):
            st, m = step(st, real, jax.random.key(1000 + i))
            tr.append([float(m["loss_gen"]), float(m["loss_disc"])])
        return np.asarray(tr)

    try:
        step32 = jax.jit(make_gan_train_step(gdef, adam))
        step16 = jax.jit(make_gan_train_step(gdef, adam,
                                             compute_dtype=jnp.bfloat16))
        # flops per step from XLA cost analysis of the bf16 program
        with fast_math():
            lowered = jax.jit(make_gan_train_step(gdef, adam)).lower(
                state0, real, jax.random.key(0))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_step = float(cost.get("flops", 0.0)) or None

        imgs32 = measure(step32, "fp32(fast_math) step")
        imgs16 = measure(step16, "bf16 compute step")
        t32, t16 = trajectory(step32), trajectory(step16)
        diff = np.abs(t32 - t16)
        record("train_bf16", imgs_per_sec_fp32=round(imgs32, 1),
               imgs_per_sec_bf16=round(imgs16, 1),
               flops_per_step=flops_step,
               mfu_fp32=round(flops_step * imgs32 / bs / PEAK_FLOPS, 4)
               if flops_step else None,
               mfu_bf16=round(flops_step * imgs16 / bs / PEAK_FLOPS, 4)
               if flops_step else None,
               loss_traj_meandiff=round(float(diff.mean()), 5),
               loss_traj_maxdiff=round(float(diff.max()), 5))
    except Exception as e:
        record("train_bf16", error=repr(e))


LEGS = {
    "compile_bisect": leg_compile_bisect,
    "tp_chunk": leg_tp_chunk,
    "lowp_io": leg_lowp_io,
    "pallas": leg_pallas,
    "train_bf16": leg_train_bf16,
}


def main():
    # lowp_io is opt-in only: round-2 already measured bf16-materialized conv
    # outputs as a negative on the fitness path (docs/BENCH.md — no win, gate
    # broken at 2.9e-3); run it explicitly to re-check on new shapes.
    names = sys.argv[1:] or [n for n in LEGS if n != "lowp_io"]
    # one TPU holder at a time, as a mechanism (core/tpulock.py)
    from gan_discovery_pso_tpu.core.tpulock import tpu_lock

    with tpu_lock("bench_ab"):
        for n in names:
            log(f"[bench_ab] ===== leg {n} =====")
            try:
                LEGS[n]()
            except Exception as e:
                record(n, error=repr(e))
    log("[bench_ab] done")


if __name__ == "__main__":
    main()

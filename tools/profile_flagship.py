"""Decompose the flagship PSO-iteration wall time on the real TPU.

Times each stage of the fused program separately (generator forward,
assessor forward, full fitness, swarm update math, full optimize
iteration) across batch sizes and dtypes, so bench.py regressions or MFU
work can be attributed to the right op. Run standalone:

    python tools/profile_flagship.py [--trace DIR]

With --trace it also dumps a jax.profiler trace of the batched bf16
program for offline inspection.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gan_discovery_pso_tpu.core import seed_all
from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.models import (
    GeneratorDef,
    ResNetDef,
    generator_init,
    resnet_init,
)
from gan_discovery_pso_tpu.models.dcgan import generator_forward
from gan_discovery_pso_tpu.models.resnet import resnet_apply
from gan_discovery_pso_tpu.ops import rescale01_per_sample
from gan_discovery_pso_tpu.ops.precision import fast_math
from gan_discovery_pso_tpu.pso import make_batched_discovery_runner
from gan_discovery_pso_tpu.pso.fitness import apply_discovery_fitness
from gan_discovery_pso_tpu.pso.swarm import mean_pairwise_distance, pso_iteration, swarm_init

DIM = 100
N_CLASSES = 8


def timeit(fn, *args, reps=5, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    flops = None
    try:
        cost = fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    tf = f"  {flops / best / 1e12:7.2f} TF/s" if flops else ""
    print(f"{label:<46} {best * 1e3:9.3f} ms{tf}", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} devices={jax.devices()}", file=sys.stderr)
    keys = seed_all(42)
    gp, gs = generator_init(keys("g"), GeneratorDef(z_dim=DIM))
    rdef = ResNetDef("ResNet50", 1, N_CLASSES, (0, 2, 3, 4, 6, 7, 8, 9))
    rp, rs = resnet_init(keys("r"), rdef, init="glorot_normal")

    for dtype, tag in ((None, "fp32"), (jnp.bfloat16, "bf16")):
        if dtype is not None:
            cast = lambda t: jax.tree.map(lambda x: x.astype(dtype), t)
            gp_, gs_, rp_, rs_ = cast(gp), cast(gs), cast(rp), cast(rs)
        else:
            gp_, gs_, rp_, rs_ = gp, gs, rp, rs
        for batch in (256, 2048):
            z = jax.random.normal(keys(f"z{batch}"), (batch, DIM, 1, 1), jnp.float32)
            if dtype is not None:
                z = z.astype(dtype)
            pos = z.reshape(batch, DIM).astype(jnp.float32)

            ctx = fast_math() if dtype is not None else _null()
            with ctx:
                g_fwd = jax.jit(lambda zz: generator_forward(gp_, gs_, zz))
                t_g = timeit(g_fwd, z, label=f"[{tag} b={batch}] G forward")
                img = g_fwd(z)
                img01 = rescale01_per_sample(img.astype(jnp.float32)).astype(img.dtype)
                r_fwd = jax.jit(
                    lambda xx: resnet_apply(rp_, rs_, xx, rdef, train=False)[0]
                )
                t_r = timeit(r_fwd, img01, label=f"[{tag} b={batch}] ResNet50 forward")
                fit = jax.jit(
                    lambda p: apply_discovery_fitness(
                        p, gp_, gs_, rp_, rs_, rdef, 2, dtype=dtype
                    )
                )
                t_f = timeit(fit, pos, label=f"[{tag} b={batch}] full fitness")
            print(f"    G {t_g * 1e3:.3f} + R {t_r * 1e3:.3f} = "
                  f"{(t_g + t_r) * 1e3:.3f} vs fitness {t_f * 1e3:.3f} ms")

    # swarm-update math alone (fp32, one 32p swarm and one 256p swarm)
    hp = PsoConfig(n_iterations=50, n_particles=32, dim_space=DIM)
    for n in (32, 256):
        st = swarm_init(keys(f"s{n}"), n, DIM, hp.w_inertia)
        fv = jax.random.uniform(keys(f"f{n}"), (n,), jnp.float32)
        r1 = jax.random.uniform(keys(f"r1{n}"), (n,), jnp.float32)
        r2 = jax.random.uniform(keys(f"r2{n}"), (n,), jnp.float32)
        upd = jax.jit(lambda s, f, a, b: pso_iteration(s, f, a, b, hp))
        timeit(upd, st, fv, r1, r2, label=f"[fp32 n={n}] pso_iteration math")
        mp = jax.jit(mean_pairwise_distance)
        timeit(mp, st.positions, label=f"[fp32 n={n}] mean_pairwise_distance")

    # the real flagship program, 32p and 256p
    class_idxs = jnp.arange(N_CLASSES, dtype=jnp.int32)
    swarm_keys = jnp.stack([keys(f"pso_{c}") for c in range(N_CLASSES)])
    for n_p in (32, 256):
        hp_n = PsoConfig(n_iterations=50, n_particles=n_p, dim_space=DIM)
        run = make_batched_discovery_runner(rdef, hp_n, dtype=jnp.bfloat16)
        f = lambda: run(swarm_keys, gp, gs, rp, rs, class_idxs)
        with fast_math():
            out = f()
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            best = min(best, time.perf_counter() - t0)
        evals = N_CLASSES * n_p * 50
        print(f"[bf16 batched 8c x {n_p}p x 50it] {best * 1e3:9.1f} ms  "
              f"{evals / best:10.0f} evals/s  "
              f"({best / 50 * 1e3:.3f} ms/iter)", flush=True)
        if args.trace and n_p == 32:
            with jax.profiler.trace(args.trace):
                jax.block_until_ready(f())
            print(f"trace written to {args.trace}")


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    # one TPU holder at a time, as a mechanism (core/tpulock.py)
    from gan_discovery_pso_tpu.core.tpulock import tpu_lock

    with tpu_lock("profile_flagship"):
        main()

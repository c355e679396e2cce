"""Quick A/B of conv lowering choices on the batched flagship program only.

Usage: python tools/ab_lowering.py  (env GDPT_CONV_LOWERING / GDPT_CONVT_LOWERING
are read by ops/conv.py at trace time, so each config re-jits).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gan_discovery_pso_tpu.core import seed_all
from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.models import GeneratorDef, ResNetDef, generator_init, resnet_init
from gan_discovery_pso_tpu.ops.precision import fast_math
from gan_discovery_pso_tpu.pso import make_batched_discovery_runner

DIM, N_CLASSES = 100, 8


def main():
    keys = seed_all(42)
    gp, gs = generator_init(keys("g"), GeneratorDef(z_dim=DIM))
    rdef = ResNetDef("ResNet50", 1, N_CLASSES, (0, 2, 3, 4, 6, 7, 8, 9))
    rp, rs = resnet_init(keys("r"), rdef, init="glorot_normal")
    class_idxs = jnp.arange(N_CLASSES, dtype=jnp.int32)
    swarm_keys = jnp.stack([keys(f"pso_{c}") for c in range(N_CLASSES)])

    configs = [
        ("dilated+direct", "dilated", "direct"),
        ("subpixel+direct", "auto", "direct"),
        ("einsum1x1+direct", "einsum1x1", "direct"),
        ("dilated+s2d", "dilated", "auto"),
    ]
    for n_p in (32, 256):
        hp = PsoConfig(n_iterations=50, n_particles=n_p, dim_space=DIM)
        for tag, convt, conv in configs:
            os.environ["GDPT_CONVT_LOWERING"] = convt
            os.environ["GDPT_CONV_LOWERING"] = conv
            run = make_batched_discovery_runner(rdef, hp, dtype=jnp.bfloat16)
            f = lambda: run(swarm_keys, gp, gs, rp, rs, class_idxs)

            def barrier(out):
                # honest barrier: a real host transfer of a result array —
                # on this backend block_until_ready can return before the
                # execution finishes (see bench.py / docs/BENCH.md)
                return np.asarray(out[0].g_best_val, np.float32)

            with fast_math():
                barrier(f())
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                barrier(f())
                best = min(best, time.perf_counter() - t0)
            evals = N_CLASSES * n_p * 50
            print(f"[{n_p}p {tag:<16}] {best * 1e3:8.1f} ms "
                  f"{evals / best:9.0f} evals/s ({best / 50 * 1e3:.3f} ms/iter)",
                  flush=True)


if __name__ == "__main__":
    main()

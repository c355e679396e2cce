"""Hands-on: PSO on analytic objectives (the reference's pedagogical
harness, src/hands_on/example_pso.py / pso.py, rebuilt on the tensorized
engine). Run: python examples/pso_analytic.py"""

import sys
from pathlib import Path

# runnable as a plain script: Python puts the script's dir on sys.path,
# not the cwd, so add the repo root for the package import
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.pso import analytic, make_analytic_fitness, optimize, last_iteration


def main():
    for name, fn in [("sphere", analytic.sphere),
                     ("cosine_mixture", analytic.cosine_mixture),
                     ("rastrigin", analytic.rastrigin)]:
        hp = PsoConfig(n_iterations=100, n_particles=32, dim_space=2,
                       w_inertia=0.73, w_cognitive=1.496, w_social=1.496,
                       early_stopping=True, tolerance=1e-7)
        final, hist, _ = jax.jit(
            lambda k, f=fn, hp=hp: optimize(k, make_analytic_fitness(f), hp)
        )(jax.random.key(0))
        print(f"{name:16s} best={float(final.g_best_val):+.6f} "
              f"at {list(map(float, final.g_best_pos))} "
              f"(iter {last_iteration(hist)})")


if __name__ == "__main__":
    main()

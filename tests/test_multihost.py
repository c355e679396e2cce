"""Two-process multi-host smoke (marked slow): the distributed backend
(SURVEY §5.8 / PARITY row 28) validated ACROSS OS PROCESSES on CPU —
jax.distributed init via parallel.distributed_initialize_if_needed, a
global 8-device mesh spanning both processes, and the sharded-swarm PSO
whose global-best reduction crosses the process boundary every iteration.

Run with: python -m pytest -m slow tests/test_multihost.py
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["GDPT_COORDINATOR"] = sys.argv[2]
    os.environ["GDPT_NUM_PROCESSES"] = "2"
    os.environ["GDPT_PROCESS_ID"] = str(pid)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from gan_discovery_pso_tpu.core.config import PsoConfig
    from gan_discovery_pso_tpu.parallel import (
        distributed_initialize_if_needed, make_mesh, make_sharded_optimize,
    )
    from gan_discovery_pso_tpu.pso import analytic, make_analytic_fitness

    assert distributed_initialize_if_needed() is True
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    mesh = make_mesh(8, "swarm")  # spans BOTH processes
    hp = PsoConfig(n_iterations=10, n_particles=16, dim_space=4)
    fit = make_analytic_fitness(analytic.sphere)
    final, hist, _ = make_sharded_optimize(mesh, fit, hp)(jax.random.key(7))
    jax.block_until_ready(final)
    # g_best_val is fully replicated -> addressable from every process
    print(f"MH_RESULT pid={pid} g_best={float(final.g_best_val):.8f}", flush=True)

    # multi-host checkpoint: positions are sharded ACROSS PROCESSES
    # (not fully addressable); save_pytree allgathers and process 0 writes
    from gan_discovery_pso_tpu.core.checkpoint import load_pytree, save_pytree

    ckpt = os.path.join(sys.argv[3], "swarm_mh.msgpack")
    save_pytree(ckpt, final._asdict())
    if jax.process_index() == 0:
        plain = load_pytree(ckpt)
        assert plain["positions"].shape == (16, 4), plain["positions"].shape
        assert abs(float(plain["g_best_val"]) - float(final.g_best_val)) < 1e-12
        print(f"MH_CKPT pid={pid} ok", flush=True)

    # data-parallel GAN train step: batch sharded ACROSS PROCESSES, params
    # replicated, gradient all-reduce rides the cross-process collectives
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gan_discovery_pso_tpu.core.config import AdamConfig
    from gan_discovery_pso_tpu.models import DiscriminatorDef, GeneratorDef
    from gan_discovery_pso_tpu.train.dcgan import gan_init, make_gan_train_step

    dmesh = make_mesh(8, "data")
    gdef, ddef = GeneratorDef(z_dim=8, features_g=8), DiscriminatorDef(features_d=8)
    adam = AdamConfig(lr=1e-3, beta1=0.5, beta2=0.99)
    state, _ = gan_init(jax.random.key(0), gdef, ddef, adam)
    state = jax.device_put(state, jax.tree.map(
        lambda _: NamedSharding(dmesh, P()), state))
    # every process owns HALF the global batch (deterministic, pid-seeded)
    local = np.random.RandomState(100 + pid).rand(8, 1, 28, 28) * 2 - 1
    real = jax.make_array_from_process_local_data(
        NamedSharding(dmesh, P("data")), jnp.asarray(local, jnp.float32), (16, 1, 28, 28))
    step = jax.jit(make_gan_train_step(gdef, adam))
    state, metrics = step(state, real, jax.random.key(1))
    jax.block_until_ready(metrics)
    print(f"MH_GAN pid={pid} loss_gen={float(metrics['loss_gen']):.8f} "
          f"loss_disc={float(metrics['loss_disc']):.8f}", flush=True)
    """
)


def test_two_process_sharded_swarm(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo_root = Path(__file__).resolve().parents[1]
    env["PYTHONPATH"] = f"{repo_root}:{env.get('PYTHONPATH', '')}"
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), coord, str(ckpt_dir)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    vals, gan_losses = [], []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("MH_RESULT")]
        assert line, out[-2000:]
        vals.append(float(line[0].split("g_best=")[1]))
        gline = [ln for ln in out.splitlines() if ln.startswith("MH_GAN")]
        assert gline, out[-2000:]
        gan_losses.append(gline[0].split("pid=")[1].split(" ", 1)[1])
    # both processes observe the same replicated global best ...
    assert vals[0] == vals[1]
    # ... and identical replicated DP-GAN losses (grad psums crossed DCN)
    assert gan_losses[0] == gan_losses[1]
    # cross-process-sharded state checkpointed once, full-shape, reloadable
    assert any("MH_CKPT" in out for out in outs)
    assert (tmp_path / "ckpt" / "swarm_mh.msgpack").exists()

    # ... and it matches the single-process single-device trajectory
    import jax

    from gan_discovery_pso_tpu.core.config import PsoConfig
    from gan_discovery_pso_tpu.pso import analytic, make_analytic_fitness, optimize

    hp = PsoConfig(n_iterations=10, n_particles=16, dim_space=4)
    ref, _, _ = optimize(jax.random.key(7), make_analytic_fitness(analytic.sphere), hp)
    np.testing.assert_allclose(vals[0], float(ref.g_best_val), rtol=1e-4, atol=1e-6)

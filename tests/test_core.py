import numpy as np
import pytest

from gan_discovery_pso_tpu.core import (
    Config,
    KeyChain,
    PsoConfig,
    RunDir,
    get_next_run_id,
    load_config,
    load_pytree,
    save_pytree,
    format_time,
)
from gan_discovery_pso_tpu.core.checkpoint import Checkpointer

CFG = "configs/dcgan_mnist.yaml"


def test_config_loads_reference_yaml():
    cfg = load_config(CFG)
    assert cfg.seed == 42
    assert cfg.data.image_size == 28
    assert list(cfg.data.iid_classes) == [0, 2, 3, 4, 6, 7, 8, 9]
    assert cfg.trainer_pso.n_particles == 32
    assert cfg["trainer_gan"]["z_dim"] == 10
    with pytest.raises(AttributeError):
        _ = cfg.nonexistent_block


def test_config_overrides():
    cfg = load_config(CFG, overrides={"trainer_pso.n_particles": 64})
    assert cfg.trainer_pso.n_particles == 64
    # original untouched semantics
    cfg2 = cfg.with_overrides({"trainer_pso.dim_space": 100})
    assert cfg.trainer_pso.dim_space == 2
    assert cfg2.trainer_pso.dim_space == 100


def test_pso_config_block():
    cfg = load_config(CFG)
    pso = PsoConfig.from_config(cfg.trainer_pso)
    assert pso.n_iterations == 50
    assert pso.w_inertia == pytest.approx(0.73)
    assert pso.w_cognitive == pytest.approx(1.496)
    assert not pso.early_stopping
    # pso_inverter block carries BOTH keys: early_stopping=20 is the CNN
    # fine-tune patience, early_stopping_pso=False is the swarm flag
    # (reference pso_inverter.py:321) — the PSO-specific key must win,
    # else the stock config silently truncates trajectories
    psoi = PsoConfig.from_config(cfg.trainer_pso_inverter)
    assert psoi.n_particles == 256
    assert psoi.dim_space == 10
    assert psoi.early_stopping is False
    assert int(cfg.trainer_pso_inverter["early_stopping"]) == 20


def test_keychain_deterministic_and_independent():
    a, b = KeyChain(42), KeyChain(42)
    k1, k2 = a("s"), a("s")
    assert not np.array_equal(
        np.asarray(jax_key_data(k1)), np.asarray(jax_key_data(k2))
    )
    # same seed replays identically
    assert np.array_equal(np.asarray(jax_key_data(b("s"))), np.asarray(jax_key_data(k1)))
    # independent streams: drawing from "other" does not perturb "s"
    c = KeyChain(42)
    c("other")
    assert np.array_equal(np.asarray(jax_key_data(c("s"))), np.asarray(jax_key_data(k1)))
    # checkpoint/restore of counters
    st = a.state()
    d = KeyChain(42)
    d.restore(st)
    assert np.array_equal(np.asarray(jax_key_data(d("s"))), np.asarray(jax_key_data(a("s"))))


def jax_key_data(k):
    import jax.random

    return jax.random.key_data(k)


def test_rundir_id_scheme(tmp_path):
    r1 = RunDir("pso_discovery", "mnist", tmp_path / "reports", tmp_path / "models", tmp_path / "interim")
    assert r1.name == "00001--pso_discovery"
    r2 = RunDir("pso_discovery", "mnist", tmp_path / "reports", tmp_path / "models", tmp_path / "interim")
    assert r2.name == "00002--pso_discovery"
    # different module gets its own counter
    r3 = RunDir("dcgan", "mnist", tmp_path / "reports", tmp_path / "models", tmp_path / "interim")
    assert r3.name == "00001--dcgan"
    assert get_next_run_id(tmp_path / "reports" / "mnist", "dcgan") == 2


def test_rundir_snapshot(tmp_path):
    cfg = load_config(CFG)
    r = RunDir("dcgan", "mnist", tmp_path / "r", tmp_path / "m", tmp_path / "i")
    r.snapshot_config(cfg)
    assert (r.reports_dir / "configuration.yaml").exists()
    r.write_timing({"training_time": 1.5})
    assert (r.reports_dir / "timing.json").exists()
    # reference pickle twins (general/timing.pkl + overall_history.pkl,
    # e.g. src/training/dcgan.py:209-214) with the reference's keys
    import pickle

    with open(r.reports_dir / "general" / "timing.pkl", "rb") as f:
        t = pickle.load(f)
    assert t["training_time"] == 1.5 and "overall_time" in t
    r.write_overall_history({"loss": [1.0, 0.5]})
    with open(r.reports_dir / "general" / "overall_history.pkl", "rb") as f:
        assert pickle.load(f) == {"loss": [1.0, 0.5]}


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    tree = {"w": jnp.arange(6.0).reshape(2, 3), "meta": {"epoch": 3}}
    p = save_pytree(tmp_path / "ck.msgpack", tree)
    out = load_pytree(p)
    np.testing.assert_array_equal(out["w"], np.arange(6.0).reshape(2, 3))
    assert out["meta"]["epoch"] == 3

    ck = Checkpointer(tmp_path)
    ck.save_every_epoch("g", 5, tree, loss=1.25)
    loaded = ck.load("checkpoint_g.msgpack")
    assert loaded["epoch"] == 5
    assert loaded["loss"] == 1.25
    assert ck.try_load("missing.msgpack") is None


def test_format_time():
    assert format_time(30) == "30s"
    assert format_time(90) == "1m 30s"
    assert format_time(3700) == "1h 01m 40s"


def test_optimizer_name_reaches_make_optimizer():
    """A YAML `optimizer: {name: RMSprop}` must actually build RMSprop —
    the name used to be validated and then silently dropped."""
    import jax.numpy as jnp
    import numpy as np

    from gan_discovery_pso_tpu.core.config import AdamConfig
    from gan_discovery_pso_tpu.train.common import make_optimizer

    cfg = AdamConfig.from_config({"name": "RMSprop", "lr": 0.1})
    assert cfg.name == "RMSprop"
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}
    tx_r = make_optimizer(cfg)
    tx_a = make_optimizer(AdamConfig.from_config({"name": "Adam", "lr": 0.1}))
    up_r, _ = tx_r.update(grads, tx_r.init(params), params)
    up_a, _ = tx_a.update(grads, tx_a.init(params), params)
    # the two optimizers take visibly different first steps
    assert not np.allclose(np.asarray(up_r["w"]), np.asarray(up_a["w"]))


def test_jit_init_matches_eager_init():
    """core.jit_init (one fused init program — the TPU-tunnel dispatch fix)
    must produce the same parameters as the eager per-tensor init. Fusion
    may reassociate the RNG math, so equality is up to float ulps, not
    bit-exact."""
    import jax
    import numpy as np

    from gan_discovery_pso_tpu.core import jit_init
    from gan_discovery_pso_tpu.models import GeneratorDef, generator_init

    gdef = GeneratorDef(z_dim=8, features_g=8)
    key = jax.random.key(7)
    eager = generator_init(key, gdef, dcgan_init=True)
    fused = jit_init(generator_init, gdef, dcgan_init=True)(key)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        eager, fused,
    )


def test_rmsprop_matches_torch():
    """make_optimizer('RMSprop') must track torch.optim.RMSprop defaults:
    alpha=0.99 and eps OUTSIDE the sqrt (reference get_opti passes only
    lr/eps/weight_decay, util_dcgan.py:36-42)."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    from gan_discovery_pso_tpu.core.config import AdamConfig
    from gan_discovery_pso_tpu.train.common import make_optimizer

    g_np = np.array([0.5, -1.25, 2.0], np.float32)
    p_t = torch.nn.Parameter(torch.tensor([1.0, 2.0, 3.0]))
    opt_t = torch.optim.RMSprop([p_t], lr=0.01, eps=1e-8)
    cfg = AdamConfig.from_config({"name": "RMSprop", "lr": 0.01,
                                  "epsilon": 1e-8})
    tx = make_optimizer(cfg)
    p_j = {"w": jnp.asarray([1.0, 2.0, 3.0])}
    s_j = tx.init(p_j)
    for _ in range(3):
        p_t.grad = torch.tensor(g_np)
        opt_t.step()
        up, s_j = tx.update({"w": jnp.asarray(g_np)}, s_j, p_j)
        p_j = {"w": p_j["w"] + up["w"]}
    np.testing.assert_allclose(np.asarray(p_j["w"]), p_t.detach().numpy(),
                               rtol=1e-6, atol=1e-7)

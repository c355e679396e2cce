"""Coverage for smaller contracts: label smoothing ranges, optimizers,
Tee/Notifier, profiling timers, postprocess, augment config plumbing."""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.core.config import AdamConfig
from gan_discovery_pso_tpu.core.logging import MetricsWriter, Notifier, Tee
from gan_discovery_pso_tpu.core.profiling import throughput, timed
from gan_discovery_pso_tpu.ops.rescale import postprocess_uint8
from gan_discovery_pso_tpu.train.common import (
    bce_from_logits,
    bce_on_probs,
    make_optimizer,
    smooth_negative,
    smooth_positive,
)


def test_label_smoothing_ranges():
    """pos → [0.7, 1.2], neg → [0.0, 0.3] (reference util_dcgan.py:77-83)."""
    k = jax.random.key(0)
    pos = np.asarray(smooth_positive(k, (10000,)))
    neg = np.asarray(smooth_negative(k, (10000,)))
    assert pos.min() >= 0.7 and pos.max() <= 1.2
    assert neg.min() >= 0.0 and neg.max() <= 0.3
    # actually fills the range
    assert pos.max() > 1.1 and pos.min() < 0.8
    assert neg.max() > 0.25


def test_bce_formulations_agree():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(32), jnp.float32)
    targets = jnp.asarray(rng.rand(32), jnp.float32)
    a = float(bce_from_logits(logits, targets))
    b = float(bce_on_probs(jax.nn.sigmoid(logits), targets))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_optimizer_factory_variants():
    import optax

    adam = make_optimizer(AdamConfig(lr=1e-3, weight_decay=1e-5))
    rms = make_optimizer(AdamConfig(lr=1e-3), name="RMSprop")
    p = {"w": jnp.ones((3,))}
    for tx in (adam, rms):
        st = tx.init(p)
        up, _ = tx.update({"w": jnp.ones((3,))}, st, p)
        assert np.all(np.isfinite(np.asarray(up["w"])))
    try:
        make_optimizer(AdamConfig(), name="SGD")
        assert False
    except ValueError:
        pass


def test_tee_duplicates_stdout(tmp_path):
    log = tmp_path / "log.txt"
    with Tee(log):
        print("hello tee")
    assert "hello tee" in log.read_text()
    # stdout restored
    assert sys.stdout.isatty() or not isinstance(sys.stdout, Tee)


def test_notifier_never_raises():
    calls = []
    n = Notifier(hook=lambda e, p: calls.append((e, p)))
    n("start", run="x")
    assert calls[0][0] == "start"
    bad = Notifier(hook=lambda e, p: 1 / 0)
    bad("boom")  # must swallow hook failures


def test_metrics_writer_tensorboard_sink(tmp_path):
    mw = MetricsWriter(tmp_path, "m", tensorboard=True)
    mw.append(0, loss=1.5)
    mw.append(1, loss=1.0)
    # image sink (reference logs real/fake/pso grids, util_dcgan.py:285-297)
    mw.add_image("Real", np.random.RandomState(0).rand(1, 8, 8), step=0)
    assert mw.history()["loss"] == [1.5, 1.0]
    mw.close()
    assert (tmp_path / "m.csv").exists()
    # TB event files written when torch tensorboard is available
    tb_files = list((tmp_path / "logs" / "m").rglob("events.*"))
    assert tb_files, "tensorboard sink produced no event files"


def test_metrics_writer_drop_rows_resumes_jsonl_and_csv(tmp_path):
    """drop_rows_from truncates the append-mode jsonl at the given step AND
    seeds the in-memory rows, so the close-time csv rewrite spans the whole
    run — not just the resumed invocation (the dcgan resume path relies on
    both: stages.py run_dcgan)."""
    import csv
    import json

    mw = MetricsWriter(tmp_path, "h")
    for s in range(3):
        mw.append(s, loss=float(s))
    mw.close()

    # a resumed writer re-runs steps 1..2 after reconciling to step 1
    mw2 = MetricsWriter(tmp_path, "h")
    mw2.drop_rows_from(1)
    mw2.append(1, loss=10.0)
    mw2.append(2, loss=20.0)
    assert mw2.history()["loss"] == [0.0, 10.0, 20.0]
    mw2.close()

    rows = [json.loads(l) for l in open(tmp_path / "h.jsonl")]
    assert [r["step"] for r in rows] == [0, 1, 2]
    assert [r["loss"] for r in rows] == [0.0, 10.0, 20.0]
    with open(tmp_path / "h.csv") as f:
        crows = list(csv.DictReader(f))
    assert [float(r["loss"]) for r in crows] == [0.0, 10.0, 20.0]


def test_metrics_writer_drop_rows_from_zero(tmp_path):
    """A kill during epoch 0 leaves a stale step-0 row with NO checkpoint:
    the resume restarts from scratch and must drop ALL rows (run_dcgan now
    calls drop_rows_from(0); `if resume and offset` used to skip it)."""
    import json

    mw = MetricsWriter(tmp_path, "h")
    mw.append(0, loss=1.0)
    mw.close()
    mw2 = MetricsWriter(tmp_path, "h")
    mw2.drop_rows_from(0)
    mw2.append(0, loss=9.0)
    mw2.close()
    rows = [json.loads(l) for l in open(tmp_path / "h.jsonl")]
    assert [(r["step"], r["loss"]) for r in rows] == [(0, 9.0)]


def test_metrics_writer_add_image_noop_without_tb(tmp_path):
    mw = MetricsWriter(tmp_path, "n", tensorboard=False)
    mw.add_image("Real", np.zeros((1, 4, 4)), step=0)  # must not raise
    mw.close()


def test_timed_and_throughput():
    sink = {}
    with timed(sink, "t"):
        _ = jnp.ones((8, 8)).sum().block_until_ready()
    assert sink["t"] > 0
    tp = throughput(100, 2.0)
    assert tp["evals_per_sec"] == 50.0


def test_postprocess_uint8():
    imgs = jnp.asarray([[[-1.0, 0.0, 1.0]]])
    out = np.asarray(postprocess_uint8(imgs))
    np.testing.assert_array_equal(out, [[[0, 128, 255]]])
    assert out.dtype == np.uint8


def test_load_cnn_diagnoses_architecture_mismatch(tmp_path):
    """Loading an AlexNet checkpoint through a ResNetDef (or vice versa)
    must fail with config guidance, not a KeyError deep inside a jitted
    fitness trace."""
    import jax
    import numpy as np
    import pytest

    from gan_discovery_pso_tpu.core.checkpoint import save_pytree
    from gan_discovery_pso_tpu.models import AlexNetDef, ResNetDef, alexnet_init
    from gan_discovery_pso_tpu.models.resnet import resnet_init
    from gan_discovery_pso_tpu.pipelines import load_cnn

    ap, ast = alexnet_init(jax.random.key(0), AlexNetDef(image_channels=1, n_class=2,
                                                         img_size=28, padding=1))
    save_pytree(tmp_path / "model.msgpack", {"params": ap, "state": ast})
    rdef = ResNetDef("ResNet50", 1, 2, (0, 1))
    with pytest.raises(ValueError, match="AlexNet checkpoint"):
        load_cnn(tmp_path, rdef)

    rp, rs = resnet_init(jax.random.key(1), rdef, init="glorot_normal")
    save_pytree(tmp_path / "model.msgpack", {"params": rp, "state": rs})
    with pytest.raises(ValueError, match="ResNet checkpoint"):
        load_cnn(tmp_path, AlexNetDef(image_channels=1, n_class=2))


def test_alexnet_activation_and_initializer_config():
    """get_activation / get_initializer config options (reference
    util_cnn.py:48-79): cnn_activation ReLU vs LeakyReLU changes the
    forward; unknown names raise like the reference's ValueError; the
    assessor factory plumbs model_cnn.network.cnn_activation."""
    import pytest

    from gan_discovery_pso_tpu.core.config import Config
    from gan_discovery_pso_tpu.models import AlexNetDef, alexnet_init
    from gan_discovery_pso_tpu.models.resnet import alexnet_apply
    from gan_discovery_pso_tpu.pipelines.stages import assessor_factory

    d_leaky = AlexNetDef(image_channels=1, n_class=2, img_size=28, padding=1)
    d_relu = d_leaky._replace(activation="ReLU")
    params, state = alexnet_init(jax.random.key(0), d_leaky)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 1, 28, 28), jnp.float32)
    y_leaky, _ = alexnet_apply(params, state, x, d_leaky)
    y_relu, _ = alexnet_apply(params, state, x, d_relu)
    assert not np.allclose(np.asarray(y_leaky), np.asarray(y_relu))
    with pytest.raises(ValueError):
        alexnet_apply(params, state, x, d_leaky._replace(activation="GELU"))

    cfg = Config({
        "model_cnn": {"model_name": "AlexNet",
                      "network": {"kernel": 3, "padding": "valid",
                                  "cnn_activation": "ReLU",
                                  "cnn_initializer": "he_normal"}},
    })

    class _D:
        channel = 1
        image_size = 28
        iid_classes = (0, 1)

    mdef, init_fn, apply_fn = assessor_factory(cfg, _D, 2)
    assert mdef.activation == "ReLU"
    # the init_fn honors the initializer name end-to-end
    p2, _ = init_fn(jax.random.key(1), mdef, "he_normal")
    assert p2["conv1"]["w"].shape == params["conv1"]["w"].shape

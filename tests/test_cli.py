"""CLI surface tests for the host-side stages (the compute-heavy legs are
exercised via the pipelines API in test_pipeline_e2e.py; the full CLI chain
runs on real hardware in the verify drives)."""

import json

import numpy as np
from PIL import Image

from gan_discovery_pso_tpu.cli.main import main
from gan_discovery_pso_tpu.data.xlsx import write_xlsx
from gan_discovery_pso_tpu.pso.io import save_particle_histories


def test_cli_claro_preprocess_end_to_end(tmp_path):
    """`claro-preprocess` runs from config + manifests with no extra args
    (reference src/data/dataset_preparation.py driver)."""
    dataset = "claro_prospettivo"
    rng = np.random.RandomState(0)
    slice_ids = []
    for pid in ("PAT1", "PAT2"):
        d = tmp_path / "raw" / dataset / pid / "images"
        d.mkdir(parents=True)
        for s in range(2):
            sid = f"{pid}_{s}"
            Image.fromarray(
                rng.uniform(-1500, 1500, (64, 64)).astype(np.float32)
            ).save(d / f"{sid}.tif")
            slice_ids.append(sid)
    interim_ds = tmp_path / "interim" / dataset
    interim_ds.mkdir(parents=True)
    write_xlsx(interim_ds / f"patients_info_{dataset}.xlsx",
               {"image": [f"imgs/{sid}.tif" for sid in slice_ids]})
    write_xlsx(tmp_path / "boxes.xlsx",
               {"img ID": slice_ids, "max_box": ["[10, 12, 50, 44]"] * 4})

    rc = main([
        "claro-preprocess", "--cfg", "configs/claro_preprocess.yaml", "--set",
        f"data.data_dir={tmp_path / 'raw'}",
        f"data.interim_dir={tmp_path / 'interim'}",
        f"data.model_dir={tmp_path / 'models'}",
        f"data.reports_dir={tmp_path / 'reports'}",
        "data.image_size=32",
        f"data.box_file={tmp_path / 'boxes.xlsx'}",
        "data.box_value=max_box",
    ])
    assert rc == 0
    runs = list((tmp_path / "interim" / dataset).glob("*claro_preprocess"))
    assert runs and len(list((runs[0] / "stylegan").glob("*.tif"))) == 4


def test_cli_pso_inverter_analysis(tmp_path):
    rng = np.random.RandomState(1)
    iid_dir = tmp_path / "iid"
    ood_dir = tmp_path / "ood"
    for label, off in ((0, -4.0), (2, 4.0)):
        traj = rng.randn(3, 12, 5).astype(np.float32) + off
        save_particle_histories(iid_dir, label, traj, np.zeros_like(traj), "iid")
    ood = rng.randn(3, 9, 5).astype(np.float32) - 4.0
    save_particle_histories(ood_dir, 1, ood, np.zeros_like(ood), "ood")

    rc = main([
        "pso-inverter-analysis", "--cfg", "configs/dcgan_mnist.yaml",
        "--path-pso", str(iid_dir), "--path-ood-pso", str(ood_dir),
        "--ood-patient", "1", "--set",
        f"data.data_dir={tmp_path / 'raw'}",
        f"data.interim_dir={tmp_path / 'interim'}",
        f"data.model_dir={tmp_path / 'models'}",
        f"data.reports_dir={tmp_path / 'reports'}",
        "data.iid_classes=[0, 2]",
    ])
    assert rc == 0
    reports = list((tmp_path / "reports").glob(
        "mnist/*pso_inverter_analysis/ood_patient_1_cluster_assignment.json"))
    assert reports
    rep = json.loads(reports[0].read_text())
    assert rep["n_ood_latents"] == 9
    # the OoD cloud sits on class 0's side -> one dominant cluster
    assert len(rep["cluster_counts"]) == 1


def test_cli_latent_dim_sweep(tmp_path):
    """The latent-dim sweep driver (reference start.sh:11-36): one
    independent run dir per (dim, stage) leg."""
    rc = main([
        "sweep", "--latent-dims", "4", "6", "--stages", "cae",
        "--tiny", "--limit", "96", "--set", "trainer_ae.batch_size=32",
        f"data.data_dir={tmp_path / 'raw'}",
        f"data.interim_dir={tmp_path / 'interim'}",
        f"data.model_dir={tmp_path / 'models'}",
        f"data.reports_dir={tmp_path / 'reports'}",
    ])
    assert rc == 0
    runs = sorted((tmp_path / "models" / "mnist").glob("*--cae"))
    assert len(runs) == 2  # one leg per latent dim
    for r in runs:
        assert (r / "encoder.msgpack").exists()


def test_cli_pso_inverter_analysis_requires_paths(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        main(["pso-inverter-analysis", "--cfg", "configs/dcgan_mnist.yaml",
              "--set",
              f"data.data_dir={tmp_path / 'raw'}",
              f"data.interim_dir={tmp_path / 'interim'}",
              f"data.model_dir={tmp_path / 'models'}",
              f"data.reports_dir={tmp_path / 'reports'}"])


def test_cli_export_model_generator(tmp_path):
    """`export-model generator` writes a self-contained StableHLO artifact
    from a dcgan checkpoint, creating no run dir."""
    import jax

    from gan_discovery_pso_tpu.compat.export import load_exported
    from gan_discovery_pso_tpu.core.checkpoint import save_pytree
    from gan_discovery_pso_tpu.models import GeneratorDef, generator_init
    from gan_discovery_pso_tpu.models.dcgan import generator_forward

    gp, gs = generator_init(jax.random.key(0), GeneratorDef(z_dim=8, features_g=8))
    gan_dir = tmp_path / "gan"
    gan_dir.mkdir()
    save_pytree(gan_dir / "best_g.msgpack",
                {"state": {"gen_params": gp, "gen_state": gs}})

    out = tmp_path / "g.shlo"
    rc = main([
        "export-model", "generator", str(out),
        "--path-gan", str(gan_dir), "--batch", "4",
        "--set", "trainer_gan.z_dim=8",
    ])
    assert rc == 0 and out.stat().st_size > 0
    g = load_exported(out)
    z = jax.numpy.zeros((4, 8, 1, 1), jax.numpy.float32)
    np.testing.assert_array_equal(
        np.asarray(g.call(z)), np.asarray(generator_forward(gp, gs, z)))
    assert not (tmp_path / "reports").exists()  # no run dir side effects


def test_cli_export_model_honors_tiny(tmp_path):
    """--tiny applies the same overrides as the run-dir stages: exporting
    from a tiny-run checkpoint must trace tiny shapes without the user
    hand-replicating every --set (used to be silently ignored)."""
    import jax

    from gan_discovery_pso_tpu.core.checkpoint import save_pytree
    from gan_discovery_pso_tpu.models import GeneratorDef, generator_init

    # tiny-run shapes: z_dim=8, features_g=8 (cli _TINY)
    gp, gs = generator_init(jax.random.key(0), GeneratorDef(z_dim=8, features_g=8))
    gan_dir = tmp_path / "gan"
    gan_dir.mkdir()
    save_pytree(gan_dir / "best_g.msgpack",
                {"state": {"gen_params": gp, "gen_state": gs}})
    out = tmp_path / "g.shlo"
    rc = main([
        "export-model", "generator", str(out),
        "--path-gan", str(gan_dir), "--batch", "2", "--tiny",
    ])
    assert rc == 0 and out.stat().st_size > 0


def test_cli_convert_and_export_torch_roundtrip(tmp_path):
    """`export-torch` is the CLI inverse of `convert-torch`: tar → msgpack
    → tar preserves the state dict exactly."""
    import torch

    from tests.test_torch_import import _ref_generator

    torch.manual_seed(0)
    g = _ref_generator()
    torch.save({"epoch": 3, "model_state_dict": g.state_dict(), "loss": 0.5},
               tmp_path / "best_g.tar")
    rc = main(["convert-torch", str(tmp_path / "best_g.tar"), "generator",
               str(tmp_path / "best_g.msgpack")])
    assert rc == 0
    rc = main(["export-torch", str(tmp_path / "best_g.msgpack"), "generator",
               str(tmp_path / "out.tar"), "--epoch", "3", "--loss", "0.5"])
    assert rc == 0
    blob = torch.load(tmp_path / "out.tar", weights_only=False)
    assert blob["epoch"] == 3
    want = g.state_dict()
    for k, v in blob["model_state_dict"].items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(v.numpy(), want[k].numpy(), err_msg=k)

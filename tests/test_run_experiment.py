"""Experiment-driver resume semantics (tools/run_experiment.py).

Containers are recycled between rounds: timings.jsonl survives in git while
the gitignored artifact roots are wiped. The driver must (a) re-run legs
whose recorded artifacts vanished, (b) seed committed snapshot names as
empty placeholders so the run-id allocator never collides with them, and
(c) not accumulate duplicate skip records across resumed invocations
(ADVICE r4).
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"


@pytest.fixture
def rex(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "rex_under_test", TOOLS / "run_experiment.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    # repoint the module at a scratch repo layout
    m.REPO = tmp_path
    m.EXP = tmp_path / "experiments"
    m.TIMINGS = m.EXP / "timings.jsonl"
    (m.EXP / "histories").mkdir(parents=True)
    for rel in m.ROOTS.values():
        (tmp_path / rel).mkdir(parents=True)
    return m


def _rec(leg, run_dirs):
    return {"leg": leg, "rc": 0, "run_dirs": run_dirs}


def test_record_valid_requires_existing_nonempty_dirs(rex, tmp_path):
    rec = _rec("dcgan_z9", {"models": ["00003--dcgan"]})
    # missing entirely
    assert not rex.record_valid(rec)
    # present but EMPTY (a seeded placeholder) still doesn't count
    d = tmp_path / rex.ROOTS["models"] / "00003--dcgan"
    d.mkdir(parents=True)
    assert not rex.record_valid(rec)
    # real content validates
    (d / "best_g.msgpack").write_bytes(b"x")
    assert rex.record_valid(rec)


def test_load_records_drops_stale_and_keeps_live(rex, tmp_path, capsys):
    live = tmp_path / rex.ROOTS["interim"] / "00001--pso_discovery"
    live.mkdir(parents=True)
    (live / "particles_iid_class_0.npz").write_bytes(b"x")
    rex.TIMINGS.write_text(
        json.dumps(_rec("pso_z2", {"interim": ["00001--pso_discovery"]})) + "\n"
        + json.dumps(_rec("dcgan_z2", {"models": ["00001--dcgan"]})) + "\n")
    recs = rex.load_records()
    assert "pso_z2" in recs
    assert "dcgan_z2" not in recs  # artifacts gone -> re-run
    assert "will re-run" in capsys.readouterr().out


def test_seed_run_roots_bumps_allocator_past_snapshots(rex, tmp_path):
    (rex.EXP / "histories" / "00007--dcgan").mkdir()
    (rex.EXP / "histories" / "00002--cae").mkdir()
    rex.seed_run_roots()
    from gan_discovery_pso_tpu.core.rundir import get_next_run_id

    reports = tmp_path / "reports" / "mnist"
    assert get_next_run_id(reports, "dcgan") == 8
    assert get_next_run_id(reports, "cae") == 3
    assert get_next_run_id(reports, "pso_discovery") == 1
    # placeholders are empty -> never validate a stale record
    assert not rex.record_valid(_rec("dcgan_z8", {"models": ["00007--dcgan"]}))


def test_skip_records_not_duplicated(rex):
    rex.EVER_RECORDED.clear()
    dv = rex.Driver()
    dv._record_skip("legA", "deps: x=failed")
    dv._record_skip("legA", "deps: x=failed")
    lines = rex.TIMINGS.read_text().splitlines()
    assert len(lines) == 1
    # pre-existing records (any rc) also suppress new skip rows
    rex.EVER_RECORDED.add("legB")
    dv._record_skip("legB", "whatever")
    assert len(rex.TIMINGS.read_text().splitlines()) == 1


def test_record_valid_rejects_dim_mismatched_squatter(rex, tmp_path):
    """After a recycle, the run-id allocator can hand a stale record's dir
    name to a NEW run of a DIFFERENT dim (observed live in round 5: the
    rebuilt dcgan_z10 took 00008--dcgan, which the round-4 dcgan_z20
    record pointed at, so z20 wrongly skipped as 'already done'). A record
    that pinned a z_dim must match the run dir's configuration.yaml."""
    rec = {"leg": "dcgan_z20", "rc": 0,
           "argv": ["gan_discovery_pso_tpu.cli", "dcgan", "--set",
                    "trainer_gan.z_dim=20", "trainer_pso.dim_space=20"],
           "run_dirs": {"models": ["00008--dcgan"],
                        "reports": ["00008--dcgan"]}}
    mdl = tmp_path / rex.ROOTS["models"] / "00008--dcgan"
    rep = tmp_path / rex.ROOTS["reports"] / "00008--dcgan"
    mdl.mkdir(parents=True)
    rep.mkdir(parents=True)
    (mdl / "best_g.msgpack").write_bytes(b"x")
    # no configuration.yaml -> ownership unverifiable -> trust existence
    assert rex.record_valid(rec)
    # a squatter of a different dim invalidates the record
    (rep / "configuration.yaml").write_text(
        "trainer_gan:\n  z_dim: 10\n")
    assert not rex.record_valid(rec)
    # the leg's own artifacts validate
    (rep / "configuration.yaml").write_text(
        "trainer_gan:\n  z_dim: 20\n")
    assert rex.record_valid(rec)

"""TPU holder-lock mechanism (core/tpulock.py — VERDICT r4 weak #1).

The lock is host-local file-based mutual exclusion for the single TPU
tunnel; these tests exercise acquisition, release, stale-holder reaping,
wait/timeout, and the platform gating that keeps it out of CPU test runs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from gan_discovery_pso_tpu.core import tpulock


@pytest.fixture
def lockfile(tmp_path, monkeypatch):
    p = tmp_path / "tpu.lock"
    monkeypatch.setenv("GDPT_TPU_LOCK", str(p))
    # the test harness pins JAX_PLATFORMS=cpu (conftest), which disables the
    # lock; pretend we're on the TPU plugin for these tests
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.delenv("GDPT_NO_TPU_LOCK", raising=False)
    return p


def test_acquire_creates_and_releases(lockfile):
    with tpulock.tpu_lock("t1") as held:
        assert held == lockfile
        info = json.loads(lockfile.read_text())
        assert info["pid"] == os.getpid()
        assert info["holder"] == "t1"
        assert tpulock.current_holder() == info
    assert not lockfile.exists()
    assert tpulock.current_holder() is None


def test_stale_lock_is_reaped(lockfile):
    # a dead pid's lock must not block the next holder
    lockfile.write_text(json.dumps({"pid": 2 ** 22 + 12345, "holder": "dead",
                                    "started": 0}))
    assert tpulock.current_holder() is None  # stale == no holder
    with tpulock.tpu_lock("t2", wait_s=10.0, poll_s=0.01):
        assert json.loads(lockfile.read_text())["holder"] == "t2"


def test_corrupt_lock_is_reaped(lockfile):
    lockfile.write_text("not json")
    with tpulock.tpu_lock("t3", wait_s=10.0, poll_s=0.01):
        assert json.loads(lockfile.read_text())["holder"] == "t3"


def test_live_holder_blocks_until_timeout(lockfile):
    # a LIVE pid (this process) holds the lock -> acquisition times out
    lockfile.write_text(json.dumps({"pid": os.getpid(), "holder": "live",
                                    "started": 0}))
    with pytest.raises(TimeoutError) as ei:
        with tpulock.tpu_lock("t4", wait_s=0.05, poll_s=0.01):
            pass
    assert "live" in str(ei.value)
    assert json.loads(lockfile.read_text())["holder"] == "live"  # untouched


def test_waits_for_release_of_real_process(lockfile, tmp_path):
    # a subprocess holds the lock for ~0.4s; acquisition waits it out
    script = (
        "import json, os, sys, time\n"
        f"p = {str(lockfile)!r}\n"
        "open(p, 'w').write(json.dumps({'pid': os.getpid(), 'holder': 'sub',"
        " 'started': time.time()}))\n"
        "print('held', flush=True)\n"
        "time.sleep(0.4)\n"
        "os.unlink(p)\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.PIPE, text=True)
    try:
        assert proc.stdout.readline().strip() == "held"
        with tpulock.tpu_lock("t5", wait_s=30.0, poll_s=0.05):
            assert json.loads(lockfile.read_text())["holder"] == "t5"
    finally:
        proc.wait(timeout=10)


def test_gating(monkeypatch, tmp_path):
    p = tmp_path / "l"
    monkeypatch.setenv("GDPT_TPU_LOCK", str(p))
    # CPU-pinned processes (the test suite itself) never touch the lock
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not tpulock.lock_required()
    with tpulock.tpu_lock("t6") as held:
        assert held is None
    assert not p.exists()
    # explicit escape hatch
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("GDPT_NO_TPU_LOCK", "1")
    assert not tpulock.lock_required()
    # the production environment (axon plugin preset) engages it
    monkeypatch.delenv("GDPT_NO_TPU_LOCK")
    assert tpulock.lock_required()
    # no env at all (bare local run): engage — contention-safe by default
    monkeypatch.delenv("JAX_PLATFORMS")
    assert tpulock.lock_required()

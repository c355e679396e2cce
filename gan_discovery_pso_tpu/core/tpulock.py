"""Single-holder TPU lease: exclusivity as a MECHANISM, not prose.

This host reaches one TPU chip through a tunnel that admits one client at a
time; two processes issuing programs concurrently time-slice the device and
corrupt every throughput measurement (round-4 post-mortem: a DCGAN sweep leg
still training while the benchmark ran recorded the flagship at 96k evals/s
vs its clean 790k — an 8x contention artifact that became the number of
record). CLAUDE.md's "one TPU holder at a time" rule now lives here: every
TPU-using entry point (bench.py, the CLI stages, tools/bench_ab.py) takes
this lock before initializing the backend and blocks — with a visible
message — while another holder is alive.

Design: a pidfile at /tmp/gdpt_tpu.lock (override: GDPT_TPU_LOCK) created
with O_CREAT|O_EXCL, holding {pid, holder, started}. Stale locks (their pid
no longer alive) are reaped automatically, so crashed runs never wedge the
queue. The lock is advisory and host-local — exactly the scope of the
failure it prevents (both round-4 holders were processes on this host).

Not engaged when JAX is pinned to CPU (tests set JAX_PLATFORMS=cpu — no
device to contend for) or when GDPT_NO_TPU_LOCK=1 (escape hatch for
intentionally concurrent read-only probes).
"""

from __future__ import annotations

import contextlib
import errno
import json
import os
import sys
import time
from pathlib import Path

DEFAULT_LOCK_PATH = "/tmp/gdpt_tpu.lock"


def lock_path() -> Path:
    return Path(os.environ.get("GDPT_TPU_LOCK", DEFAULT_LOCK_PATH))


def lock_required() -> bool:
    """The lock matters only when this process can touch the TPU."""
    if os.environ.get("GDPT_NO_TPU_LOCK") == "1":
        return False
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "tpu" not in platforms and "axon" not in platforms:
        # explicitly pinned away from the TPU (tests pin "cpu")
        return False
    return True


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # pragma: no cover - exists but not ours
        return True
    return True


def current_holder(path: Path | None = None) -> dict | None:
    """The live holder's {pid, holder, started}, or None (absent/stale)."""
    p = path or lock_path()
    try:
        info = json.loads(p.read_text())
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        return None
    if not _pid_alive(int(info.get("pid", -1))):
        return None
    return info


def _try_acquire(p: Path, holder: str) -> bool:
    try:
        fd = os.open(str(p), os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except OSError as e:
        if e.errno != errno.EEXIST:
            raise
        # reap a stale lock (crashed holder) and retry on the next poll
        try:
            info = json.loads(p.read_text())
            stale = not _pid_alive(int(info.get("pid", -1)))
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            # unreadable/vanished: treat as stale
            stale, info = True, None
        if stale:
            with contextlib.suppress(FileNotFoundError, OSError):
                p.unlink()
            print(f"[tpulock] reaped stale lock {info}", file=sys.stderr,
                  flush=True)
        return False
    with os.fdopen(fd, "w") as f:
        json.dump({"pid": os.getpid(), "holder": holder,
                   "started": time.time()}, f)
    return True


@contextlib.contextmanager
def tpu_lock(holder: str, wait_s: float | None = None, poll_s: float = 5.0):
    """Hold the TPU lease for the duration of the context.

    Blocks up to `wait_s` seconds (default: GDPT_TPU_LOCK_WAIT_S or 7200)
    while another holder is alive, logging who holds it once a minute.
    Raises TimeoutError after the wait budget — callers should surface that
    rather than proceed to a contended measurement.
    """
    if not lock_required():
        yield None
        return
    if wait_s is None:
        wait_s = float(os.environ.get("GDPT_TPU_LOCK_WAIT_S", 7200))
    p = lock_path()
    t0 = time.time()
    last_msg = 0.0
    while not _try_acquire(p, holder):
        waited = time.time() - t0
        if waited >= wait_s:
            raise TimeoutError(
                f"TPU lock held by {current_holder(p)} after waiting "
                f"{waited:.0f}s (lock file: {p})")
        if time.time() - last_msg >= 60.0 or last_msg == 0.0:
            print(f"[tpulock] waiting for TPU: held by {current_holder(p)} "
                  f"({waited:.0f}s elapsed)", file=sys.stderr, flush=True)
            last_msg = time.time()
        time.sleep(poll_s)
    try:
        yield p
    finally:
        # release only if the file is still ours (defensive against manual
        # cleanup + reacquisition by another process)
        try:
            info = json.loads(p.read_text())
            if int(info.get("pid", -1)) == os.getpid():
                p.unlink()
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            pass

"""Profiling / tracing: device traces and timed sections.

The reference records only wall-clock pairs into timing.pkl
(reference src/training/pso_discovery.py:242-251; SURVEY.md §5.1). The TPU
framework adds:

- `trace(...)`: a jax.profiler trace context writing a TensorBoard-loadable
  profile of the wrapped section (the PSO step, a train epoch);
- `timed(...)`: block_until_ready-synchronized wall-clock sections whose
  results accumulate into a dict compatible with RunDir.write_timing;
- `throughput(...)`: evals/sec helper — the north-star metric.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path, enabled: bool = True):
    """Device profile of the enclosed section → `log_dir` (view with
    TensorBoard or xprof)."""
    if not enabled:
        yield
        return
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class timed:
    """with timed(timings, "training_time"): ... — synchronizes the device
    before and after so the recorded span is real device time."""

    def __init__(self, sink: dict, name: str, sync: object | None = None):
        self.sink = sink
        self.name = name
        self.sync = sync

    def __enter__(self):
        (jax.device_put(0.0) + 0).block_until_ready()  # drain queue
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            jax.block_until_ready(self.sync)
        self.sink[self.name] = self.sink.get(self.name, 0.0) + time.time() - self.t0
        return False


def throughput(n_evals: int, seconds: float) -> dict:
    return {"evals": n_evals, "seconds": seconds, "evals_per_sec": n_evals / seconds}

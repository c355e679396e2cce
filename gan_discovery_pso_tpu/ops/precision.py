"""Precision policy: fp32-parity by default, opt-in bf16 fast math.

The parity contract (BASELINE.md "fp32 output fidelity") makes
`Precision.HIGHEST` the default for every conv/matmul in ops/. Production
PSO sweeps don't need bit-parity — they need throughput — so `fast_math()`
flips traced ops to the MXU's native bf16 passes:

    with fast_math():
        fitness = make_discovery_fitness(..., dtype=jnp.bfloat16)

The switch is trace-time: a jit traced under fast_math() bakes DEFAULT
precision in; traces outside keep HIGHEST. The update math (best/velocity/
position) stays fp32 either way — only the model forwards relax.
"""

from __future__ import annotations

import contextlib
import threading

from jax import lax

_state = threading.local()


def default_precision():
    return lax.Precision.DEFAULT if getattr(_state, "fast", False) else lax.Precision.HIGHEST


@contextlib.contextmanager
def fast_math(enabled: bool = True):
    prev = getattr(_state, "fast", False)
    _state.fast = enabled
    try:
        yield
    finally:
        _state.fast = prev

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

RETRACE CONTRACT: every switch in this module (fast_math, precision_override,
lowp_io) is a thread-local consulted while TRACING — none of them is part of
a jit cache key. Calling an already-compiled jitted function under a
different switch setting silently reuses the stale program. To get a program
per setting, make the setting visible to jit yourself: construct a fresh
jitted callable (a new runner/factory closure) per setting, or thread the
resolved precision in as a static argument. The factories in pso/fitness.py
and train/ close over the policy at construction time for exactly this
reason — build one runner per policy, never flip the switch around calls to
an existing one.
"""

from __future__ import annotations

import contextlib
import threading

from jax import lax

_state = threading.local()


def default_precision():
    override = getattr(_state, "override", None)
    if override is not None:
        return override
    return lax.Precision.DEFAULT if getattr(_state, "fast", False) else lax.Precision.HIGHEST


@contextlib.contextmanager
def fast_math(enabled: bool = True):
    prev = getattr(_state, "fast", False)
    _state.fast = enabled
    try:
        yield
    finally:
        _state.fast = prev


@contextlib.contextmanager
def precision_override(level):
    """Trace-time: force every ops/ conv/matmul to `level` (a lax.Precision),
    bypassing the fast_math()/HIGHEST policy. Used by the bench to run fp32
    programs at Precision.HIGH (3-pass bf16x3, ~fp32-accurate) when the
    backend's HIGHEST lowering is pathologically slow to compile.

    NOT a jit cache key — wrap the TRACE of a freshly constructed runner;
    see the module docstring's RETRACE CONTRACT."""
    prev = getattr(_state, "override", None)
    _state.override = level
    try:
        yield
    finally:
        _state.override = prev


def resolve_accum_dtype(operand_dtype, requested):
    """Pick the `preferred_element_type` for a conv/matmul whose operands are
    `operand_dtype`.

    Default: the requested accumulation dtype (fp32) — the inference recipe
    (multiply bf16, accumulate + hand fp32 to the next layer). Under
    `lowp_io()`, low-precision operands keep their own dtype as the output
    instead: JAX cannot reverse-differentiate a conv whose
    preferred_element_type differs from its operand dtype (the f32 cotangent
    meets the saved bf16 operand inside the transpose rule and
    lax.conv_general_dilated rejects the mix), so the differentiable
    mixed-precision TRAIN path needs bf16-in/bf16-out programs. The MXU still
    accumulates each contraction in fp32 internally either way."""
    import numpy as np

    if getattr(_state, "lowp_io", False) and np.dtype(operand_dtype).itemsize < 4:
        return None
    return requested


@contextlib.contextmanager
def lowp_io(enabled: bool = True):
    """Trace-time switch: low-precision conv/matmul operands produce
    low-precision outputs (see resolve_accum_dtype). Wrap the TRACE of a
    differentiable bf16 program in this; fp32 programs are unaffected.

    NOT a jit cache key — wrap the TRACE of a freshly constructed runner;
    see the module docstring's RETRACE CONTRACT."""
    prev = getattr(_state, "lowp_io", False)
    _state.lowp_io = enabled
    try:
        yield
    finally:
        _state.lowp_io = prev

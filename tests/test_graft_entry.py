"""Driver-contract tests: entry() compiles; dryrun_multichip(8) executes."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == (32,)
    assert bool(jax.numpy.all(jax.numpy.isfinite(out)))


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)

"""Pytree checkpointing: atomic msgpack save/load for params + opt + swarm state.

The reference scatters state across torch `.tar` dicts with model+optimizer
(reference src/utils/util_dcgan.py:225-238), bare `.pt` state_dicts
(src/pso/util_cnn.py:380-383), and pickled DataFrames for swarm histories
(src/pso/util_pso.py:159-165). Here every checkpoint is one msgpack-encoded
pytree written atomically (tmp + rename), preemption-safe, with the same
best/last-model selection contracts. File names keep the reference stems
(`checkpoint_g`, `best_g`, `encoder`, `model_{label}`) with a `.msgpack`
suffix so runs are self-describing.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save_pytree(path: str | Path, tree: Any) -> Path:
    """Atomically serialize a pytree of arrays/scalars/dicts to msgpack.

    NamedTuples (e.g. BatchNormStats, optax states) are flattened to plain
    dicts keyed by field name; loaders restore their concrete types
    (ops.BatchNormStats has a `{mean, var}` signature loaders match on).

    Multi-host safe: arrays sharded across processes are allgathered (a
    collective — every process must call save_pytree), only process 0
    writes the file, and a global barrier after the write prevents
    read-after-save races (a resume on a shared filesystem sees either the
    complete file on every process or on none)."""
    path = Path(path)
    host_tree = _plainify(tree)  # allgathers non-addressable shards
    multi = jax.process_count() > 1
    if not multi or jax.process_index() == 0:
        path.parent.mkdir(parents=True, exist_ok=True)
        blob = serialization.msgpack_serialize(host_tree)
        tmp = path.with_suffix(path.suffix + ".tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # atomic on POSIX
    if multi:  # every process enters the barrier, writer last
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"save_pytree:{path.name}")
    return path


def load_pytree(path: str | Path, target: Any = None) -> Any:
    """Load a msgpack pytree; if `target` is given, restore into its structure
    (keeps dtypes/shapes validated against the template)."""
    with open(path, "rb") as f:
        blob = f.read()
    if target is not None:
        return serialization.from_bytes(target, blob)
    return serialization.msgpack_restore(blob)


def _to_host(x):
    if isinstance(x, jax.Array):
        if not x.is_fully_addressable:  # sharded across processes
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)
    return x


def restore_into(template, plain):
    """Restore a `_plainify`'d checkpoint into a typed template pytree:
    NamedTuples rebuilt from field-name dicts, tuples/lists re-zipped,
    leaves materialized as jnp arrays with the template's structure."""
    if hasattr(template, "_fields"):  # NamedTuple
        return type(template)(
            **{f: restore_into(getattr(template, f), plain[f]) for f in template._fields}
        )
    if isinstance(template, dict):
        return {k: restore_into(v, plain[k]) for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        rebuilt = [restore_into(t, p) for t, p in zip(template, plain)]
        return type(template)(rebuilt) if isinstance(template, tuple) else rebuilt
    if plain is None:
        return template
    return jnp.asarray(plain)


def restore_tree(node):
    """Inverse of `_plainify` for loaded checkpoints: lifts `{mean, var}`
    dicts back to BatchNormStats and materializes arrays as jnp."""
    from gan_discovery_pso_tpu.ops import BatchNormStats

    if isinstance(node, dict):
        if set(node) == {"mean", "var"}:
            return BatchNormStats(jnp.asarray(node["mean"]), jnp.asarray(node["var"]))
        return {k: restore_tree(v) for k, v in node.items()}
    if isinstance(node, list):
        return [restore_tree(v) for v in node]
    if isinstance(node, np.ndarray):
        return jnp.asarray(node)
    return node


def _plainify(node):
    """Recursively: NamedTuple → dict, tuple/list → list, arrays → numpy."""
    if hasattr(node, "_fields"):  # NamedTuple
        return {f: _plainify(getattr(node, f)) for f in node._fields}
    if isinstance(node, dict):
        return {k: _plainify(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_plainify(v) for v in node]
    return _to_host(node)


class Checkpointer:
    """Per-run checkpoint manager with the reference's artifact contract.

    - `save_every_epoch(...)` → `checkpoint_<tag>.msgpack` overwritten per
      epoch with model + optimizer + epoch + loss
      (reference src/utils/util_dcgan.py:225-238).
    - `save_best(...)` → `best_<tag>.msgpack`
      (reference src/utils/util_dcgan.py:303-314).
    - deterministic resume: includes PRNG stream counters and step so a
      preempted run restarts bit-identically (the reference resumes only
      epoch granularity, src/utils/util_dcgan.py:162-177).
    """

    def __init__(self, model_dir: str | Path):
        self.model_dir = Path(model_dir)
        self.model_dir.mkdir(parents=True, exist_ok=True)

    def save_every_epoch(self, tag: str, epoch: int, state: Any, loss=None) -> Path:
        payload = {
            "epoch": int(epoch),
            "state": state,
            "loss": None if loss is None else float(jnp.asarray(loss)),
        }
        return save_pytree(self.model_dir / f"checkpoint_{tag}.msgpack", payload)

    def save_best(self, tag: str, epoch: int, state: Any, loss=None) -> Path:
        payload = {
            "epoch": int(epoch),
            "state": state,
            "loss": None if loss is None else float(jnp.asarray(loss)),
        }
        return save_pytree(self.model_dir / f"best_{tag}.msgpack", payload)

    def save_state_dict(self, name: str, state: Any) -> Path:
        """Bare state save, mirroring `torch.save(model.state_dict(), 'x.pt')`
        (reference src/inverter/utils_ae/util_inverter.py:290)."""
        return save_pytree(self.model_dir / f"{name}.msgpack", state)

    def load(self, filename: str, target: Any = None) -> Any:
        return load_pytree(self.model_dir / filename, target)

    def try_load(self, filename: str, target: Any = None) -> Any | None:
        """Opportunistic resume: try-load-else-None
        (reference src/training/cnn.py:154-162 pattern)."""
        p = self.model_dir / filename
        if not p.exists():
            return None
        return load_pytree(p, target)

"""Device mesh setup — the framework's distributed backbone.

The reference has NO distributed execution (single cuda:0 worker,
reference src/training/pso_discovery.py:152; parallelism = sequential bash
sweeps, src/bash/start.sh:13-36). The TPU-native design (SURVEY.md §5.8)
scales along two axes:

- "swarm": particles of one swarm sharded across chips; the global-best
  reduction each iteration is the only collective (a few KB, rides ICI);
- "data": eval/train batch data parallelism with replicated params.

Multi-swarm (per-class / per-patient, never communicating) maps to either
independent processes or a leading vmapped axis sharded over "swarm".
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "swarm") -> Mesh:
    """1-D mesh over the first n visible devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(shape: tuple[int, int], axis_names=("data", "swarm")) -> Mesh:
    devs = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, axis_names)


def shard_leading(mesh: Mesh, axis_name: str) -> NamedSharding:
    """Shard dim 0 over `axis_name`, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distributed_initialize_if_needed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host entry hook: initialize jax.distributed before building
    meshes on a multi-host topology. Returns True when running multi-host.

    Configuration comes from the arguments or, when omitted, the
    GDPT_COORDINATOR / GDPT_NUM_PROCESSES / GDPT_PROCESS_ID environment
    variables (on Cloud TPU pods jax.distributed auto-discovers instead —
    pass coordinator_address="" to force the autodetect path). Single
    process with no configuration → no-op, False.

    Validated end-to-end by the two-process CPU multi-host smoke
    (tests/test_multihost.py, marked slow): global 8-device mesh across
    two OS processes, cross-process collectives included."""
    import os

    # Detect an existing jax.distributed client WITHOUT touching the
    # backend: jax.process_count() would initialize XLA, after which
    # jax.distributed.initialize() raises.
    try:
        from jax._src import distributed as _distributed

        already = _distributed.global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift fallback
        # assume NOT initialized: querying jax.process_count() here would
        # itself initialize the backend and break the initialize() below
        already = False
    if already:
        # a client exists, so the backend query is safe now
        return jax.process_count() > 1
    if coordinator_address is None:
        coordinator_address = os.environ.get("GDPT_COORDINATOR")
    if coordinator_address is None:
        return False
    if coordinator_address == "":
        # pod autodetect needs no explicit topology
        jax.distributed.initialize()  # pragma: no cover - pod autodetect
        return jax.process_count() > 1
    if num_processes is None:
        num_processes = int(os.environ["GDPT_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["GDPT_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # pragma: no cover - launcher already did it
        if "already" not in str(e).lower():
            raise
    return jax.process_count() > 1

from gan_discovery_pso_tpu.core.config import Config, PsoConfig, load_config
from gan_discovery_pso_tpu.core.prng import KeyChain, seed_all
from gan_discovery_pso_tpu.core.rundir import RunDir, get_next_run_id
from gan_discovery_pso_tpu.core.checkpoint import (
    save_pytree,
    load_pytree,
    Checkpointer,
)
from gan_discovery_pso_tpu.core.logging import Tee, MetricsWriter, format_time

__all__ = [
    "Config",
    "PsoConfig",
    "load_config",
    "KeyChain",
    "seed_all",
    "RunDir",
    "get_next_run_id",
    "save_pytree",
    "load_pytree",
    "Checkpointer",
    "Tee",
    "MetricsWriter",
    "format_time",
]

from gan_discovery_pso_tpu.ops.pallas.swarm_update import pso_update_pallas
from gan_discovery_pso_tpu.ops.pallas.rescale import (
    rescale01_per_sample_pallas,
    rescale01_rows,
)

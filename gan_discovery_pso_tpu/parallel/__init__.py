from gan_discovery_pso_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    shard_leading,
    replicated,
    distributed_initialize_if_needed,
)
from gan_discovery_pso_tpu.parallel.swarm_sharding import (
    swarm_state_sharding,
    history_sharding,
    make_sharded_optimize,
    make_sharded_discovery_runner,
    make_batched_sharded_discovery_runner,
    make_multi_swarm_optimize,
)
from gan_discovery_pso_tpu.parallel.shardmap_swarm import make_shardmap_optimize

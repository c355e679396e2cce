from gan_discovery_pso_tpu.pso.swarm import (
    SwarmState,
    PsoHistory,
    SwarmResult,
    swarm_init,
    swarm_init_from_positions,
    pso_iteration,
    mean_pairwise_distance,
    optimize,
    optimize_jit,
    optimize_resumable,
    pso_iteration_pallas,
    last_iteration,
)
from gan_discovery_pso_tpu.pso.fitness import (
    OPTIMIZE_IN,
    OPTIMIZE_OUT,
    assessor_posterior,
    fitness_from_posterior,
    apply_discovery_fitness,
    make_discovery_fitness,
    make_discovery_fitness_dynamic,
    make_inverter_fitness,
    make_analytic_fitness,
)
from gan_discovery_pso_tpu.pso import analytic
from gan_discovery_pso_tpu.pso.io import (
    save_particle_histories,
    load_final_particle_positions,
    load_particle_trajectories,
)
from gan_discovery_pso_tpu.pso.runner import (
    make_batched_discovery_runner,
    make_chunked_batched_discovery_runner,
    make_discovery_runner,
    make_inverter_runner,
    resolve_fitness_chunk,
    select_program,
)

from gan_discovery_pso_tpu.compat.torch_export import export_torch_checkpoint
from gan_discovery_pso_tpu.compat.torch_import import (
    convert_torch_checkpoint,
    load_torch_state_dict,
)

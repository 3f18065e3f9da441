from polyp_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    mesh_from_spec,
    multihost_init,
    replicate_to,
    replicated,
    shard_batch,
    local_mesh,
    validate_batch_for_mesh,
)
from polyp_tpu.parallel.sharding import (  # noqa: F401
    lora_param_sharding,
    shard_lora,
    unet_param_sharding,
    shard_params,
)

from polyp_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
    local_mesh,
)
from polyp_tpu.parallel.sharding import (  # noqa: F401
    unet_param_sharding,
    shard_params,
)

from egorear_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
    shard_params,
)

from cone_tpu.parallel.mesh import (
    batch_sharding,
    dp_submesh,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
    tp_size,
)

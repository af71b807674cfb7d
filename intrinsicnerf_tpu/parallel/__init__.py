from intrinsicnerf_tpu.parallel.mesh import (
    make_mesh,
    pool_specs,
    replicate,
    shard_pools,
)
from intrinsicnerf_tpu.parallel.sharded_render import make_sharded_render
from intrinsicnerf_tpu.parallel.sharded_step import make_sharded_train_step

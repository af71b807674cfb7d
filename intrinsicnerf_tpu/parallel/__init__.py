from intrinsicnerf_tpu.parallel.mesh import make_mesh, shard_pools, replicate
from intrinsicnerf_tpu.parallel.sharded_step import make_sharded_train_step

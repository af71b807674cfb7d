from intrinsicnerf_tpu.data.samplers import RayBatch, sample_ray_pairs

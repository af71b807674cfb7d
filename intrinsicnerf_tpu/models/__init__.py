from intrinsicnerf_tpu.models.mlp import (
    MLPConfig,
    init_mlp_params,
    apply_mlp,
    eval_points,
    count_params,
)

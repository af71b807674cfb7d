from intrinsicnerf_tpu.ops.fused_mlp import (
    fused_eval_points,
    fused_mlp_apply,
    pack_weights,
)

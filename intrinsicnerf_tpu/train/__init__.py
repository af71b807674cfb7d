from intrinsicnerf_tpu.train.step import (
    TrainConfig,
    TrainState,
    LossReport,
    create_train_state,
    make_train_step,
)
from intrinsicnerf_tpu.train.schedules import (
    loss_weight_schedule,
    cluster_anneal,
    make_lr_schedule,
)

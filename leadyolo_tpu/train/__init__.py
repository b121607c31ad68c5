from .loss import LossConfig, compute_loss
from .optim import (
    EarlyStopping,
    EMAState,
    SGDState,
    clip_global_norm,
    ema_init,
    ema_update,
    fitness,
    linear_lf,
    one_cycle_lf,
    param_groups,
    sgd_init,
    sgd_update,
    warmup_scalars,
)
from .step import TrainConfig, TrainState, init_train_state, make_train_step

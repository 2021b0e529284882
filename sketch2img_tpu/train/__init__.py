from sketch2img_tpu.train.optim import make_optimizer, make_lr_schedule
from sketch2img_tpu.train.train_lgp import LGPTrainState, make_lgp_train_step
from sketch2img_tpu.train.train_attn_inject import (
    InjectTrainState,
    make_inject_train_step,
    split_injection_params,
    merge_injection_params,
)

__all__ = [
    "make_optimizer",
    "make_lr_schedule",
    "LGPTrainState",
    "make_lgp_train_step",
    "InjectTrainState",
    "make_inject_train_step",
    "split_injection_params",
    "merge_injection_params",
]

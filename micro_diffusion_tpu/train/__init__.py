from .optim import build_optimizer, build_schedule, ema_update
from .train_step import TrainState, create_train_state, make_train_step, make_eval_step

__all__ = [
    "build_optimizer",
    "build_schedule",
    "ema_update",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]

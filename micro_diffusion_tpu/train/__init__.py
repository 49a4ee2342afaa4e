from .optim import build_optimizer, build_schedule, ema_update
from .train_step import (TrainState, create_train_state, make_train_step,
                         make_eval_step, make_grad_step, make_apply_step,
                         make_ema_step, HostEMA, AsyncHostEMA, HostComputeEMA,
                         host_memory_sharding,
                         zero_grad_accumulator)

__all__ = [
    "build_optimizer",
    "build_schedule",
    "ema_update",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_grad_step",
    "make_apply_step",
    "make_ema_step",
    "HostEMA",
    "AsyncHostEMA",
    "HostComputeEMA",
    "host_memory_sharding",
    "zero_grad_accumulator",
]

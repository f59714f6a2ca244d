from .losses import LossConfig, compute_losses, pix_loss
from .train import (
    OptimConfig,
    TrainState,
    create_train_state,
    eval_step_fn,
    jit_eval_step,
    jit_train_step,
    train_step_fn,
)

__all__ = [
    "LossConfig",
    "compute_losses",
    "pix_loss",
    "OptimConfig",
    "TrainState",
    "create_train_state",
    "train_step_fn",
    "eval_step_fn",
    "jit_train_step",
    "jit_eval_step",
]

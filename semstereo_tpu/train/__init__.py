"""Training: state, jitted steps, checkpointing, trainer loop."""

from semstereo_tpu.train.state import (
    TrainState,
    build_model,
    build_optimizer,
    init_state,
    merge_partial_params,
    set_learning_rate,
)
from semstereo_tpu.train.steps import make_eval_step, make_train_step, valid_mask

__all__ = [
    "TrainState",
    "build_model",
    "build_optimizer",
    "init_state",
    "merge_partial_params",
    "set_learning_rate",
    "make_eval_step",
    "make_train_step",
    "valid_mask",
]

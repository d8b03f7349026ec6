"""Training runtime: state, jitted sharded steps, checkpointing, the loop."""

from .state import TrainState, TrainConfig, create_train_state
from .steps import make_train_step, make_eval_step
from .checkpoint import CheckpointManager

__all__ = [
    "TrainState",
    "TrainConfig",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "CheckpointManager",
]

"""Training machinery: jitted steps, schedules, checkpointing."""

from .checkpoint import (
    checkpoint_path,
    list_checkpoints,
    load_checkpoint_file,
    load_recent_model,
    make_checkpointer,
    save_checkpoint,
)
from .schedules import (
    BackgroundWeightSchedule,
    ReduceLROnPlateau,
    cosine_annealing_warm_restarts,
    curriculum_gates,
)
from .trainer import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_forward,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_forward",
    "make_optimizer",
    "save_checkpoint",
    "make_checkpointer",
    "load_recent_model",
    "load_checkpoint_file",
    "list_checkpoints",
    "checkpoint_path",
    "BackgroundWeightSchedule",
    "ReduceLROnPlateau",
    "cosine_annealing_warm_restarts",
    "curriculum_gates",
]

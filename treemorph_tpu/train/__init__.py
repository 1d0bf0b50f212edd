from .schedule import cosine_annealing_warm_restarts
from .harness import (
    TrainState,
    create_train_state,
    make_accum_steps,
    make_eval_step,
    make_train_step,
    run_training,
)

__all__ = [
    "cosine_annealing_warm_restarts",
    "TrainState",
    "create_train_state",
    "make_accum_steps",
    "make_train_step",
    "make_eval_step",
    "run_training",
]

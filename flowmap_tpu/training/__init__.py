from .overfit import (
    OverfitTrainerCfg,
    TrainState,
    eval_forward,
    make_train_step,
    run_overfit,
)

__all__ = [
    "OverfitTrainerCfg",
    "TrainState",
    "eval_forward",
    "make_train_step",
    "run_overfit",
]

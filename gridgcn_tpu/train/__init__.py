from gridgcn_tpu.train.metrics import (
    confusion_matrix, summarize_confusion)
from gridgcn_tpu.train.steps import (
    TrainState, create_train_state, make_train_step, make_eval_step)

__all__ = [
    "confusion_matrix",
    "summarize_confusion",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]

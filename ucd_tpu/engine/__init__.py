from .train import (
    TrainState,
    compute_train_losses,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
from .state import build_train_state, init_variables
from .metrics import (
    AverageMeter,
    confusion_matrix_update,
    empty_confusion,
    results_from_confusion,
    results_to_str,
)
from .checkpoint import (
    load_checkpoint,
    load_model_state,
    load_reg_saved,
    save_checkpoint,
)

__all__ = [
    "TrainState", "compute_train_losses", "make_eval_step", "make_lr_schedule",
    "make_optimizer", "make_train_step", "build_train_state", "init_variables",
    "AverageMeter", "confusion_matrix_update", "empty_confusion",
    "results_from_confusion", "results_to_str", "load_checkpoint",
    "load_model_state", "load_reg_saved", "save_checkpoint",
]

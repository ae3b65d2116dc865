from .loss import ErrorMetric, MetricAccumulator, WeightedLoss
from .lr_schedule import (
    PlateauScheduler,
    resolve_lr_schedule,
    resolve_optimizer,
    resolve_warmup,
)
from .trainer import (
    EarlyStopping,
    MultiEarlyStopping,
    Trainer,
    load_checkpoint,
    make_eval_step,
    make_step_core,
    make_train_step,
    restore_params,
    save_checkpoint,
)

__all__ = [
    "Trainer", "WeightedLoss", "ErrorMetric", "MetricAccumulator",
    "resolve_optimizer", "resolve_lr_schedule", "resolve_warmup",
    "PlateauScheduler", "EarlyStopping", "MultiEarlyStopping",
    "make_train_step", "make_step_core", "make_eval_step",
    "save_checkpoint", "load_checkpoint", "restore_params",
]

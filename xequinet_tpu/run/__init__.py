from .inference import run_infer, run_infer_from_args
from .test import run_test, run_test_from_args
from .train import run_train, run_train_from_args

__all__ = [
    "run_train",
    "run_train_from_args",
    "run_test",
    "run_test_from_args",
    "run_infer",
    "run_infer_from_args",
]

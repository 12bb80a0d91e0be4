from .evaluator import compute_metrics, evaluate
from .schedulers import create_scheduler
from .trainer import TrainConfig, TrainResult, train

__all__ = [
    "compute_metrics",
    "evaluate",
    "create_scheduler",
    "TrainConfig",
    "TrainResult",
    "train",
]

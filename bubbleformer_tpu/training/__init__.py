from bubbleformer_tpu.training.checkpoint import CheckpointManager, next_preempt_ckpt_path
from bubbleformer_tpu.training.module import (
    ConditionedForecastModule,
    ForecastModule,
    TrainState,
)
from bubbleformer_tpu.training.optim import make_optimizer
from bubbleformer_tpu.training.trainer import CSVLogger, Trainer

__all__ = [
    "CheckpointManager",
    "next_preempt_ckpt_path",
    "ConditionedForecastModule",
    "ForecastModule",
    "TrainState",
    "make_optimizer",
    "CSVLogger",
    "Trainer",
]

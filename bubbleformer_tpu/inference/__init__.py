from bubbleformer_tpu.inference.rollout import (
    denormalize,
    make_rollout_fn,
    make_rollout_metrics_fn,
    rollout_targets,
)

__all__ = [
    "denormalize",
    "make_rollout_fn",
    "make_rollout_metrics_fn",
    "rollout_targets",
]

"""Learning-rate schedules as optax-compatible functions of the step.

Counterpart of reference ``bubbleformer/utils/lr_schedulers.py:4-31``
(``CosineWarmupLR`` = linear warmup LambdaLR followed by CosineAnnealingLR,
milestone at ``warmup_iters``) plus the plain cosine schedule used by
``scheduler_cfg: cosine`` — implemented correctly, unlike the reference's
if/if-else dispatch bug (``modules.py:146-162``, see SURVEY.md §2 defect a).

Semantics match torch exactly:
* warmup: ``lr = base * t / warmup_iters`` for ``t < warmup_iters``
  (lr(0) = 0).
* cosine phase (after the SequentialLR milestone the inner scheduler's
  counter restarts at 0): ``lr = eta_min + (base - eta_min) *
  (1 + cos(pi * (t - warmup) / max_iters)) / 2``.
"""
from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0):
    """torch CosineAnnealingLR(T_max=t_max, eta_min), stepped per iteration."""

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * step / t_max)
        )

    return schedule


def cosine_warmup(base_lr: float, warmup_iters: int, max_iters: int, eta_min: float = 0.0):
    """Linear warmup to ``base_lr`` then cosine annealing over ``max_iters``."""

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = base_lr * step / max(warmup_iters, 1)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (step - warmup_iters) / max_iters)
        )
        return jnp.where(step < warmup_iters, warm, cos)

    return schedule


def make_schedule(name: str, base_lr: float, total_steps: int, **params):
    """Schedule factory keyed like the reference ``scheduler_cfg`` group."""
    if name == "cosine":
        return cosine_annealing(base_lr, t_max=total_steps, eta_min=params.get("eta_min", 0.0))
    if name == "cosine_warmup":
        return cosine_warmup(
            base_lr,
            warmup_iters=params.get("warmup_iters", 1000),
            max_iters=total_steps,
            eta_min=params.get("eta_min", 0.0),
        )
    if name == "constant":
        return lambda step: base_lr
    raise ValueError(f"Scheduler {name} not supported")

"""Optimizers: optax counterparts of the reference's torch optimizers.

Reference dispatch at ``bubbleformer/modules.py:132-142``: AdamW, Adam and
the Triton-fused Lion (``lion_pytorch``).  On TPU all three are optax
transformations whose update math fuses under jit — no custom kernels needed:

* ``adamw`` — decoupled weight decay (torch AdamW semantics).
* ``adam`` — torch Adam applies ``weight_decay`` as L2 *added to the
  gradient before* the moment updates; reproduced with
  ``add_decayed_weights`` ahead of ``scale_by_adam``.
* ``lion`` — optax.lion matches lion_pytorch (decoupled decay scaled by lr,
  default betas (0.9, 0.99)).
"""
from __future__ import annotations

from typing import Callable, Union

import optax

Schedule = Union[float, Callable]


def make_optimizer(name: str, schedule: Schedule, **params) -> optax.GradientTransformation:
    lr = schedule
    wd = params.get("weight_decay", 0.0)
    if name == "adamw":
        opt = optax.adamw(
            learning_rate=lr,
            b1=params.get("b1", 0.9),
            b2=params.get("b2", 0.999),
            eps=params.get("eps", 1e-8),
            weight_decay=wd,
        )
    elif name == "adam":
        opt = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_adam(
                b1=params.get("b1", 0.9),
                b2=params.get("b2", 0.999),
                eps=params.get("eps", 1e-8),
            ),
            optax.scale_by_learning_rate(lr),
        )
    elif name == "lion":
        opt = optax.lion(
            learning_rate=lr,
            b1=params.get("b1", 0.9),
            b2=params.get("b2", 0.99),
            weight_decay=wd,
        )
    else:
        raise ValueError(f"Optimizer {name} not supported")
    # One fused update over a single flat vector instead of ~5 elementwise
    # ops per parameter leaf: the update math is identical (all three
    # optimizers are elementwise), but TPU kernel-launch overhead is per op
    # (~0.1 ms measured through the profiler) and the per-leaf form costs
    # O(hundreds) of tiny launches per step on a ~100-leaf model.
    return optax.flatten(opt)

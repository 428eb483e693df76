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

import jax
import jax.numpy as jnp
import optax

Schedule = Union[float, Callable]

_LANES = 1024  # one (8, 128) f32 tile row


def flatten_2d(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run ``inner`` over ONE padded (rows, 1024) buffer of all parameters.

    Same role as ``optax.flatten`` (a single fused elementwise update
    instead of ~5 tiny ops per leaf — kernel-launch cost is per op on this
    device), but the flat buffer is 2-D and tile-aligned: profiled on v5e,
    the 1-D f32[28.9M] ravel gets re-tiled by XLA into a (N/6, 6)
    T(8, 128) layout inside the step — a 7.4 ms/step relayout of the whole
    parameter set, every step.  A (rows, 1024) buffer is already in the
    natural f32 tile shape, so the update math runs without relayouts.
    Zero-padding is harmless for elementwise optimizers (pad gradients are
    0; sign(0)=0 keeps Lion's pad updates at 0 up to weight decay of an
    all-zero pad — also 0).
    """

    # Each leaf occupies a whole number of 1024-lane ROWS of the buffer
    # (per-leaf zero padding).  With leaves at arbitrary offsets, the
    # unravel's slices start mid-tile and XLA re-tiles the WHOLE 28.9M
    # buffer to a gcd-lane layout to serve them — measured 3.8 ms/step
    # inside the scanned flagship loop (r05 scanned profile: a
    # f32[28230,1024] -> f32[4817920,6] reshape, 21x tile waste).  Row-
    # aligned segments make every slice a static whole-row slice of the
    # natural (8, 128)-tiled buffer.
    def _ravel(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        parts = []
        for x in leaves:
            flat = jnp.ravel(x)
            pad = (-flat.shape[0]) % _LANES
            if pad:
                flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
            parts.append(flat)
        return jnp.concatenate(parts).reshape(-1, _LANES)

    def _unravel(tree, buf):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out, row = [], 0
        for leaf in leaves:
            rows = (leaf.size + _LANES - 1) // _LANES
            seg = jax.lax.slice_in_dim(buf, row, row + rows, axis=0).reshape(-1)
            out.append(seg[: leaf.size].reshape(leaf.shape))
            row += rows
        return jax.tree_util.tree_unflatten(treedef, out)

    def init(params):
        return inner.init(_ravel(params))

    def update(updates, state, params=None):
        flat_u, state = inner.update(
            _ravel(updates), state, _ravel(params) if params is not None else None
        )
        return _unravel(updates, flat_u), state

    return optax.GradientTransformation(init, update)


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
    # One fused update over a single flat buffer instead of ~5 elementwise
    # ops per parameter leaf: the update math is identical (all three
    # optimizers are elementwise), but TPU kernel-launch overhead is per op
    # (~0.1 ms measured through the profiler) and the per-leaf form costs
    # O(hundreds) of tiny launches per step on a ~100-leaf model.  The
    # buffer is 2-D tile-aligned (see flatten_2d) — the 1-D optax.flatten
    # form cost a measured 7.4 ms/step whole-parameter relayout on v5e.
    return flatten_2d(opt)

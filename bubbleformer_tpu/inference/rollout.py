"""Autoregressive rollout, fully on device.

The reference rolls out with a Python loop that round-trips every window
through the host (``.cuda()`` / ``.cpu()`` per iteration,
``scripts/inference.py:239-252``).  Here the whole forecast is one jitted
``lax.scan`` carrying the last predicted window — zero host transfers until
the final stacked result, which is the single biggest inference-throughput
win of the TPU design.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def make_rollout_fn(model, num_windows: int, conditioned: bool = False):
    """Build a jitted rollout: initial window -> ``num_windows`` predictions.

    Returns ``fn(variables, init_window[, cond]) -> (num_windows, B, T, C, H, W)``
    where the first prediction consumes ``init_window`` and each subsequent
    window consumes the previous prediction (reference ``inference.py:242-243``).
    Requires output fields == input fields (as in the reference rollout).
    """

    if conditioned:

        @partial(jax.jit, static_argnames=())
        def rollout(variables, init_window, cond):
            def step(window, _):
                pred = model.apply(variables, window, cond, train=False)
                # Keep the scan carry dtype stable under bf16 compute.
                pred = pred.astype(window.dtype)
                return pred, pred

            _, preds = jax.lax.scan(step, init_window, None, length=num_windows)
            return preds

    else:

        @partial(jax.jit, static_argnames=())
        def rollout(variables, init_window):
            def step(window, _):
                pred = model.apply(variables, window, train=False)
                pred = pred.astype(window.dtype)
                return pred, pred

            _, preds = jax.lax.scan(step, init_window, None, length=num_windows)
            return preds

    return rollout


def rollout_targets(dataset, start_idx: int, num_windows: int):
    """Stack the ground-truth windows aligned with a rollout (host-side).

    Window ``k`` of the rollout predicts dataset item ``start_idx + k*tw``'s
    target slice (reference strides the dataset by ``time_window``,
    ``inference.py:239``).
    """
    import numpy as np

    tw = dataset.time_window
    targets = []
    timesteps = []
    for k in range(num_windows):
        item = dataset[start_idx + k * tw]
        targets.append(item[1])
        t0 = dataset.start_time + start_idx + (k + 1) * tw
        timesteps.append(np.arange(t0, t0 + tw))
    return np.concatenate(targets, axis=0), np.concatenate(timesteps, axis=0)


def denormalize(fields_data: jax.Array, fields, diff_terms, div_terms) -> jax.Array:
    """Undo per-field normalization on a (..., C, H, W) stack (done once,
    after the scan — the reference leaves its rollout normalized)."""
    div = jnp.asarray([div_terms[f] for f in fields], dtype=fields_data.dtype)
    diff = jnp.asarray([diff_terms[f] for f in fields], dtype=fields_data.dtype)
    return fields_data * div[:, None, None] + diff[:, None, None]

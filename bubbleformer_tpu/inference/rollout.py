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
    ``inference.py:239``).  All windows must come from the trajectory file
    containing ``start_idx`` — an autoregressive forecast is one trajectory,
    and striding across a file boundary would silently mix trajectories —
    so the index is routed through the dataset's own locator and the stride
    stops (with an error) at the boundary.
    """
    import numpy as np

    tw = dataset.time_window
    file0, _ = dataset._locate(start_idx)
    targets = []
    timesteps = []
    for k in range(num_windows):
        idx = start_idx + k * tw
        file_idx, local_start = dataset._locate(idx)
        if file_idx != file0:
            raise ValueError(
                f"rollout window {k} (dataset index {idx}) crosses a trajectory-"
                f"file boundary (file {file0} -> {file_idx}); shorten num_windows "
                f"or move start_idx"
            )
        item = dataset[idx]
        targets.append(item[1])
        t0 = local_start + tw  # target slice starts tw after the input slice
        timesteps.append(np.arange(t0, t0 + tw))
    return np.concatenate(targets, axis=0), np.concatenate(timesteps, axis=0)


def denormalize(fields_data: jax.Array, fields, diff_terms, div_terms) -> jax.Array:
    """Undo per-field normalization on a (..., C, H, W) stack (done once,
    after the scan — the reference leaves its rollout normalized)."""
    div = jnp.asarray([div_terms[f] for f in fields], dtype=fields_data.dtype)
    diff = jnp.asarray([diff_terms[f] for f in fields], dtype=fields_data.dtype)
    return fields_data * div[:, None, None] + diff[:, None, None]

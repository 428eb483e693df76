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


def make_rollout_metrics_fn(
    model,
    num_windows: int,
    dfun_index: Optional[int] = None,
    dx: float = 1.0 / 32.0,
    conditioned: bool = False,
    keep_preds: bool = False,
):
    """Rollout with physics metrics computed *inside* the scan.

    The post-hoc evaluation path (reference
    ``scripts/inference_autoregressive.ipynb`` cells 8-10; our
    ``scripts/inference.py``) stacks the full ``(num_windows, B, T, C, H, W)``
    prediction tensor just to reduce it to per-step scalars — at 512^2 a
    100-window batch-4 forecast stacks ~2 GB of HBM for KB of metrics.  Here
    each window's metrics are emitted as scan outputs and the predictions are
    discarded from the carry (unless ``keep_preds``), so rollout length no
    longer costs prediction-stack memory.

    Returns ``fn(variables, init_window, targets=None[, cond]) -> dict`` with:

    * ``rel_l2``: ``(num_windows, T, C)`` batch-mean relative L2 per predicted
      frame and field (only when ``targets`` — shaped
      ``(num_windows, B, T, C, H, W)`` — is given),
    * ``eikonal``: ``(num_windows, T)`` eikonal SDF residual of the ``dfun``
      channel (only when ``dfun_index`` is set),
    * ``vapor_fraction``: ``(num_windows, T)`` vapor area fraction,
    * ``vapor_drift``: ``(num_windows, T)`` |pred - target| vapor fraction
      (needs both ``dfun_index`` and ``targets``),
    * ``final_window``: the last predicted window (the carry), and
    * ``preds``: the full stacked rollout iff ``keep_preds=True``.

    All metrics match the post-hoc ``utils.metrics`` functions exactly
    (tested); ``targets`` presence is a trace-time property.
    """
    from bubbleformer_tpu.utils.losses import eikonal_loss

    def _window_metrics(pred, target):
        ys = {}
        if target is not None:
            diff = jnp.sqrt(
                jnp.sum((pred - target).astype(jnp.float32) ** 2, axis=(-2, -1))
            )
            norm = jnp.sqrt(jnp.sum(target.astype(jnp.float32) ** 2, axis=(-2, -1)))
            ys["rel_l2"] = jnp.mean(diff / norm, axis=0)  # (T, C)
        if dfun_index is not None:
            phi = pred[:, :, dfun_index]  # (B, T, H, W)
            eik = jax.vmap(jax.vmap(lambda p: eikonal_loss(p, dx=dx)))(phi)
            ys["eikonal"] = jnp.mean(eik, axis=0)  # (T,)
            vf = jnp.mean((phi > 0).astype(jnp.float32), axis=(-2, -1))  # (B, T)
            ys["vapor_fraction"] = jnp.mean(vf, axis=0)
            if target is not None:
                vft = jnp.mean(
                    (target[:, :, dfun_index] > 0).astype(jnp.float32), axis=(-2, -1)
                )
                ys["vapor_drift"] = jnp.mean(jnp.abs(vf - vft), axis=0)
        return ys

    @jax.jit
    def rollout(variables, init_window, targets=None, cond=None):
        if targets is not None and targets.shape[0] != num_windows:
            raise ValueError(
                f"targets leading dim {targets.shape[0]} != num_windows {num_windows}"
            )

        def step(window, xs):
            if conditioned:
                pred = model.apply(variables, window, cond, train=False)
            else:
                pred = model.apply(variables, window, train=False)
            pred = pred.astype(window.dtype)
            ys = _window_metrics(pred, xs)
            if keep_preds:
                ys = dict(ys, preds=pred)
            return pred, ys

        last, ys = jax.lax.scan(
            step,
            init_window,
            targets,
            length=num_windows if targets is None else None,
        )
        ys["final_window"] = last
        return ys

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

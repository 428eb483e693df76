"""Losses: relative Lp loss and eikonal SDF residual.

Counterparts of reference ``bubbleformer/utils/losses.py``:

* ``LpLoss`` (``:17-94``) — relative Lp norm over the last ``d`` flattened
  dims with configurable reductions per leading dim.  The training criterion
  is ``LpLoss(d=2, p=2, reduce_dims=[0,1,2], reductions=['mean','mean','sum'])``
  (reference ``modules.py:50``); inference uses ``reduce_dims=[0,1]`` with
  mean/mean (reference ``inference.py:231``).
* ``eikonal_loss`` (``:5-15``) — mean squared deviation of ``|grad phi|``
  from 1, with first-order one-sided edge stencils matching
  ``torch.gradient(..., edge_order=1)``.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp


def _gradient_1d(x: jax.Array, spacing: float, axis: int) -> jax.Array:
    """Central differences with one-sided first-order edges (torch.gradient)."""
    x = jnp.moveaxis(x, axis, -1)
    interior = (x[..., 2:] - x[..., :-2]) / (2.0 * spacing)
    lo = (x[..., 1:2] - x[..., 0:1]) / spacing
    hi = (x[..., -1:] - x[..., -2:-1]) / spacing
    g = jnp.concatenate([lo, interior, hi], axis=-1)
    return jnp.moveaxis(g, -1, axis)


def eikonal_loss(phi: jax.Array, dx: float = 1.0 / 32.0) -> jax.Array:
    """``mean((|grad phi| - 1)^2)`` over a (..., H, W) SDF field."""
    gy = _gradient_1d(phi, dx, axis=-2)
    gx = _gradient_1d(phi, dx, axis=-1)
    grad_mag = jnp.sqrt(gy**2 + gx**2)
    return jnp.mean((grad_mag - 1.0) ** 2)


class LpLoss:
    """Relative Lp loss on a tensor (b, n1, ..., nd).

    Flattens the last ``d`` dims, takes the p-norm of the difference relative
    to the p-norm of the target, then applies per-dim reductions.  Pure
    function of its inputs — safe to close over in a jitted step.
    """

    def __init__(
        self,
        d: int = 1,
        p: int = 2,
        reduce_dims: Union[int, Sequence[int]] = 0,
        reductions: Union[str, Sequence[str]] = "sum",
    ):
        self.d = d
        self.p = p
        self.reduce_dims = [reduce_dims] if isinstance(reduce_dims, int) else list(reduce_dims)
        if isinstance(reductions, str):
            assert reductions in ("sum", "mean")
            self.reductions: List[str] = [reductions] * len(self.reduce_dims)
        else:
            for r in reductions:
                assert r in ("sum", "mean")
            self.reductions = list(reductions)

    def __call__(self, y_pred: jax.Array, y: jax.Array) -> jax.Array:
        flat_pred = y_pred.reshape(y_pred.shape[: -self.d] + (-1,))
        flat_y = y.reshape(y.shape[: -self.d] + (-1,))
        diff = flat_pred.astype(jnp.float32) - flat_y.astype(jnp.float32)
        if self.p == 2:
            diff_norm = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
            ynorm = jnp.sqrt(jnp.sum(flat_y.astype(jnp.float32) ** 2, axis=-1))
        else:
            diff_norm = jnp.sum(jnp.abs(diff) ** self.p, axis=-1) ** (1.0 / self.p)
            ynorm = jnp.sum(jnp.abs(flat_y.astype(jnp.float32)) ** self.p, axis=-1) ** (
                1.0 / self.p
            )
        out = diff_norm / ynorm
        for dim, red in zip(self.reduce_dims, self.reductions):
            fn = jnp.sum if red == "sum" else jnp.mean
            out = fn(out, axis=dim, keepdims=True)
        return jnp.squeeze(out)

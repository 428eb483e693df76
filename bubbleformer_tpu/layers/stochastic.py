"""Stochastic depth (DropPath).

Replaces ``timm.layers.DropPath`` used by the reference attention blocks
(``bubbleformer/layers/attention.py:64,194``): per-sample Bernoulli gating of
the residual branch, scaled by the keep probability (``scale_by_keep``).

Implemented as a function rather than a module so the drop rate can be a
*traced* per-block value — that is what lets the whole 12-block processor be a
single ``nn.scan`` over one compiled block with the linspace'd drop-path rates
(reference ``models/axial_vit.py:100``) fed in as a scanned array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def drop_path(
    x: jax.Array,
    rate: jax.Array | float,
    rng: jax.Array | None,
    deterministic: bool,
    batch_axis: int = 0,
) -> jax.Array:
    """Drop the entire residual branch per sample with probability ``rate``.

    ``batch_axis``: which axis indexes samples (0 for the NHWC layouts; 1
    for the channel-major ``carry="cm"`` layout ``(C, B, ...)``).
    """
    if deterministic or rng is None:
        return x
    keep = 1.0 - jnp.asarray(rate, dtype=jnp.float32)
    shape = tuple(
        x.shape[i] if i == batch_axis else 1 for i in range(x.ndim)
    )
    mask = jax.random.bernoulli(rng, keep, shape=shape)
    # scale_by_keep=True (timm default): preserve expectation.
    scale = jnp.where(keep > 0.0, 1.0 / jnp.maximum(keep, 1e-8), 0.0)
    return x * (mask.astype(x.dtype) * scale.astype(x.dtype))

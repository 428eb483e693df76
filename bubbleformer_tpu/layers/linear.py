"""MLP building blocks (channels-last).

Counterparts of reference ``bubbleformer/layers/linear_layers.py``:
GeluMLP (4x expansion), SirenMLP (sine activation), FiLMMLP (feature-wise
linear modulation from thermophysical fluid parameters).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class GeluMLP(nn.Module):
    """Two-layer MLP with GELU, hidden = hidden_dim * exp_factor.

    Reference: ``linear_layers.py:5-25``.  Operates on the trailing axis, so
    on TPU both matmuls run on the MXU with the (B*H*W) rows batched.
    """

    hidden_dim: int
    exp_factor: float = 4.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(self.hidden_dim * self.exp_factor)
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(x)
        return x


class GeluMLPCM(nn.Module):
    """:class:`GeluMLP` for channel-major activations ``(C, ...)``.

    Both matmuls run stationary-weight on the MXU: ``W^T (out, in) @
    x (in, tokens)`` — the natural contraction for the ``carry="cm"``
    layout of ``models/axial_vit.py``.  Parameter names/shapes match
    :class:`GeluMLP` (``fc1``/``fc2`` Dense kernels), so checkpoints
    interchange across carry settings.
    """

    hidden_dim: int
    exp_factor: float = 4.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from bubbleformer_tpu.layers.norm import DenseParams

        hidden = int(self.hidden_dim * self.exp_factor)
        w1, b1 = DenseParams(self.hidden_dim, hidden, name="fc1")()
        w2, b2 = DenseParams(hidden, self.hidden_dim, name="fc2")()
        shape = x.shape
        x2 = x.reshape(shape[0], -1)
        dt = self.dtype or x.dtype

        def dense_cm(w, b, y):
            out = jax.lax.dot_general(
                w.astype(dt), y.astype(dt), (((0,), (0,)), ((), ()))
            )
            return out + b.astype(dt)[:, None]

        y = dense_cm(w1, b1, x2)
        y = nn.gelu(y, approximate=False)
        y = dense_cm(w2, b2, y)
        return y.reshape((self.hidden_dim,) + shape[1:])


class SirenMLP(nn.Module):
    """Single Dense layer with sine activation (SIREN).

    Reference: ``linear_layers.py:28-47`` (kept for API parity; the reference
    never instantiates it).
    """

    hidden_dim: int
    w0: float = 1.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc")(x)
        return jnp.sin(self.w0 * x)


class FiLMMLP(nn.Module):
    """FiLM conditioning: LayerNorm(params) -> Dense -> split gamma/beta.

    Produces per-channel scale and shift from a (B, param_dim) conditioning
    vector and applies ``gamma * x + beta`` broadcast over the time and
    spatial axes.  Reference: ``linear_layers.py:49-77`` (the reference
    broadcasts over (B, 1, C, 1, 1); here activations are channels-last
    (B, T, H, W, C) so we broadcast over (B, 1, 1, 1, C)).
    """

    param_dim: int
    embed_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        cond = nn.LayerNorm(epsilon=1e-5, name="norm")(cond)
        gamma_beta = nn.Dense(2 * self.embed_dim, dtype=self.dtype, name="proj")(cond)
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)  # each (B, C)
        # Broadcast (B, C) over (B, T, H, W, C).
        extra = x.ndim - 2
        shape = (x.shape[0],) + (1,) * extra + (self.embed_dim,)
        gamma = gamma.reshape(shape).astype(x.dtype)
        beta = beta.reshape(shape).astype(x.dtype)
        return gamma * x + beta

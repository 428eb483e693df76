"""Normalization layers.

The reference architecture leans on per-sample spatial InstanceNorm
(``nn.InstanceNorm2d(C, affine=True)`` at reference
``bubbleformer/layers/attention.py:39-40,153-154`` and
``bubbleformer/layers/patching.py:45,102``) rather than LayerNorm.  On TPU we
keep activations channels-last (``..., H, W, C``) so the spatial reduction is
over the two axes preceding the channel axis; the reduction + rsqrt fuse into
the surrounding elementwise ops under XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LayerNormParams(nn.Module):
    """Declares LayerNorm affine parameters without applying the norm.

    Used by fused attention kernels that compute the normalization
    in-kernel (``ops/axial_fused_block.py``): naming this module ``qnorm``
    / ``knorm`` yields parameter paths identical to ``nn.LayerNorm``'s
    (``{scale, bias}`` of shape ``(dim,)``), so checkpoints are
    interchangeable across ``attn_impl`` settings.
    """

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class DenseParams(nn.Module):
    """Declares ``nn.Dense`` parameters without applying the layer.

    Used by the whole-branch megakernel (``ops/axial_block_mega.py``) which
    computes the projection matmuls in-kernel: naming this module
    ``input_head`` / ``output_head`` yields parameter paths and initializers
    identical to ``nn.Dense``'s (``kernel`` (in, out) lecun-normal, ``bias``
    (out,) zeros), so checkpoints are interchangeable across ``attn_impl``
    settings.
    """

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return kernel, bias


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization with affine params.

    Matches ``torch.nn.InstanceNorm2d(features, affine=True)`` semantics
    (biased variance, eps=1e-5, no running statistics) for channels-last
    inputs of shape ``(..., H, W, C)``.
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # Single-pass statistics (E[x^2] - E[x]^2) in float32: one read of the
        # feature map for both moments instead of the two-pass subtract-mean
        # form — matters at the embed-pyramid resolutions where the maps are
        # hundreds of MB.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
        mean_sq = jnp.mean(jnp.square(xf), axis=(-3, -2), keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = xf * inv + (bias - mean * inv)
        return y.astype(x.dtype)


class InstanceNormCM(nn.Module):
    """InstanceNorm for channel-major activations ``(C, *groups, S)``.

    Same semantics as :class:`InstanceNorm` (per-sample, per-channel
    statistics, biased variance, eps=1e-5) for the ``carry="cm"`` layout of
    ``models/axial_vit.py``: channels lead, samples are the middle axes and
    the reduction runs over the trailing token axis.  Parameter names and
    shapes match :class:`InstanceNorm`, so checkpoints interchange across
    carry settings.
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        bshape = (self.features,) + (1,) * (x.ndim - 1)
        scale = scale.reshape(bshape)
        bias = bias.reshape(bshape)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        mean_sq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = xf * inv + (bias - mean * inv)
        return y.astype(x.dtype)

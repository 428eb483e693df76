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

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn


# Hand-written InstanceNorm VJP: autodiff of the normalize chain keeps the
# FLOAT32-converted feature map as a residual for the backward — at the
# embed/debed pyramid resolutions that is a ~500 MB f32 tensor per stage
# (r05 scanned profile: multiple 1-2 ms/step f32[20,256,256,96] copies).
# The custom VJP saves only the original-dtype input plus the tiny
# per-(sample, channel) statistics and recomputes ``xhat`` in the backward
# — identical math (the standard IN/LN gradient), one cheap fused
# recompute pass instead of a resident f32 map.
#
# ``scale``/``bias`` arrive pre-reshaped to ``x.ndim`` (1s everywhere but
# the channel axis); their cotangents keep that shape (summed with
# keepdims) and the caller's reshape maps them back to ``(C,)``.
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _instance_norm(axes, eps, x, scale, bias):
    out, _ = _in_fwd(axes, eps, x, scale, bias)
    return out


def _in_fwd(axes, eps, x, scale, bias):
    # Single-pass statistics (E[x^2] - E[x]^2) in float32: one read of the
    # feature map for both moments instead of the two-pass subtract-mean
    # form — matters at the embed-pyramid resolutions where the maps are
    # hundreds of MB.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    invstd = jax.lax.rsqrt(var + eps)
    inv = invstd * scale
    y = xf * inv + (bias - mean * inv)
    return y.astype(x.dtype), (x, mean, invstd, scale)


def _in_bwd(axes, eps, res, dy):
    x, mean, invstd, scale = res
    dyf = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * invstd
    # Affine grads reduce over every axis the broadcast scale is 1-sized in.
    aff_axes = tuple(i for i, s in enumerate(scale.shape) if s == 1)
    dscale = jnp.sum(dyf * xhat, axis=aff_axes, keepdims=True)
    dbias = jnp.sum(dyf, axis=aff_axes, keepdims=True)
    # Standard biased-variance IN gradient (per-(sample, channel) means over
    # the statistic axes):
    #   dx = scale * invstd * (dy - mean(dy) - xhat * mean(dy * xhat))
    g = dyf * scale
    m1 = jnp.mean(g, axis=axes, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=axes, keepdims=True)
    dx = (invstd * (g - m1 - xhat * m2)).astype(x.dtype)
    return dx, dscale, dbias


_instance_norm.defvjp(_in_fwd, _in_bwd)


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
        bshape = (1,) * (x.ndim - 1) + (self.features,)
        return _instance_norm(
            (-3, -2), self.eps, x, scale.reshape(bshape), bias.reshape(bshape)
        )


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
        return _instance_norm(
            (-1,), self.eps, x, scale.reshape(bshape), bias.reshape(bshape)
        )

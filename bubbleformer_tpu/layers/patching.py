"""Hierarchical patch embedding / de-embedding (channels-last).

Counterparts of reference ``bubbleformer/layers/patching.py``: a
log2(patch_size)-stage pyramid of stride-2 convolutions (intermediate width
``embed_dim // 4`` with InstanceNorm + GELU between stages) that preserves
spatial ordering, and its transpose-conv mirror.  On TPU, NHWC convolutions
map directly onto the MXU via ``lax.conv_general_dilated``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from bubbleformer_tpu.layers.norm import InstanceNorm


def _num_stages(patch_size: int) -> int:
    num_layers = int(math.log2(patch_size))
    if 2**num_layers != patch_size:
        raise ValueError("Patch size must be a power of 2")
    return num_layers


class HMLPEmbed(nn.Module):
    """Image -> patch-grid embedding: (B, H, W, C_in) -> (B, H/p, W/p, E).

    Reference: ``patching.py:6-59`` — each stage is Conv(k=2, s=2, no bias) +
    InstanceNorm(affine), with GELU between stages (not after the last).
    """

    patch_size: int = 16
    in_channels: int = 3
    embed_dim: int = 768
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        num_layers = _num_stages(self.patch_size)
        for i in range(num_layers):
            is_last = i == num_layers - 1
            out_ch = self.embed_dim if (is_last or num_layers == 1) else self.embed_dim // 4
            x = nn.Conv(
                out_ch,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = InstanceNorm(out_ch, name=f"norm{i}")(x)
            if not is_last:
                x = nn.gelu(x, approximate=False)
        return x


class HMLPDebed(nn.Module):
    """Patch-grid -> image decoding: (B, H/p, W/p, E) -> (B, H, W, C_out).

    Reference: ``patching.py:62-115`` — ConvTranspose(k=2, s=2, no bias)
    stages with InstanceNorm + GELU between stages (none after the last).
    """

    patch_size: int = 16
    out_channels: int = 3
    embed_dim: int = 768
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        num_layers = _num_stages(self.patch_size)
        for i in range(num_layers):
            is_last = i == num_layers - 1
            out_ch = self.out_channels if (is_last or num_layers == 1) else self.embed_dim // 4
            x = nn.ConvTranspose(
                out_ch,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name=f"deconv{i}",
            )(x)
            if not is_last:
                x = InstanceNorm(out_ch, name=f"norm{i}")(x)
                x = nn.gelu(x, approximate=False)
        return x

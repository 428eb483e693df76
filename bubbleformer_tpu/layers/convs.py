"""Convolutional building blocks for the U-Net baselines (channels-last).

Counterparts of reference ``bubbleformer/layers/conv_layers.py`` and the
Upsample/Downsample helpers in ``bubbleformer/models/unets.py:11-64``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ResidualBlock(nn.Module):
    """Wide-ResNet block: (GroupNorm -> GELU -> Conv3x3) x2 + shortcut.

    Reference: ``conv_layers.py:4-52``.
    """

    in_channels: int
    out_channels: int
    norm: bool = True
    n_groups: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        if self.norm:
            h = nn.GroupNorm(num_groups=self.n_groups, epsilon=1e-5, name="norm1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if self.norm:
            h = nn.GroupNorm(num_groups=self.n_groups, epsilon=1e-5, name="norm2")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)

        if self.in_channels != self.out_channels:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="shortcut"
            )(x)
        else:
            shortcut = x
        return h + shortcut


class MiddleBlock(nn.Module):
    """Two ResidualBlocks at the U-Net bottleneck (``conv_layers.py:55-93``)."""

    channels: int
    norm: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResidualBlock(self.channels, self.channels, norm=self.norm, dtype=self.dtype, name="res1")(x)
        x = ResidualBlock(self.channels, self.channels, norm=self.norm, dtype=self.dtype, name="res2")(x)
        return x


class ClassicUnetBlock(nn.Module):
    """(Conv3x3 -> BatchNorm -> GELU) x2, Ronneberger-style.

    Reference: ``conv_layers.py:96-141``.  BatchNorm keeps running statistics
    in the ``batch_stats`` collection; pass ``train=True`` during training.
    """

    out_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, momentum=0.9, name="norm1"
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, momentum=0.9, name="norm2"
        )(x)
        x = nn.gelu(x, approximate=False)
        return x


class Upsample(nn.Module):
    """2x spatial upsample via ConvTranspose(k=4, s=2, p=1).

    Reference: ``models/unets.py:11-36``.
    """

    channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # 'SAME' with k=4, s=2 pads (1, 1) per spatial dim — exactly torch's
        # ConvTranspose2d(k=4, s=2, p=1) geometry (out = 2 * in).
        return nn.ConvTranspose(
            self.channels,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding="SAME",
            transpose_kernel=True,
            dtype=self.dtype,
            name="conv",
        )(x)


class Downsample(nn.Module):
    """2x spatial downsample via Conv(k=3, s=2, p=1).

    Reference: ``models/unets.py:39-64``.
    """

    channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=1,
            dtype=self.dtype,
            name="conv",
        )(x)

"""U-Net baselines: ModernUnet (wide-ResNet) and ClassicUnet (Ronneberger 2015).

Counterparts of reference ``bubbleformer/models/unets.py:67-183`` and
``:186-328``.  Time is folded into channels (temporal bundling as channel
stacking), activations are channels-last internally, public API keeps the
reference ``(B, T, C, H, W)`` layout.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bubbleformer_tpu.layers.convs import (
    ClassicUnetBlock,
    Downsample,
    MiddleBlock,
    ResidualBlock,
    Upsample,
)
from bubbleformer_tpu.models._api import register_model

__all__ = ["ModernUnet", "ClassicUnet"]


def _fold_time(x: jax.Array) -> jax.Array:
    """(B, T, C, H, W) -> channels-last (B, H, W, T*C)."""
    b, t, c, h, w = x.shape
    x = x.reshape(b, t * c, h, w)
    return jnp.transpose(x, (0, 2, 3, 1))


def _unfold_time(x: jax.Array, time_window: int) -> jax.Array:
    """Channels-last (B, H, W, T*C) -> (B, T, C, H, W)."""
    b, h, w, tc = x.shape
    x = jnp.transpose(x, (0, 3, 1, 2))
    return x.reshape(b, time_window, tc // time_window, h, w)


@register_model("unet_modern")
class ModernUnet(nn.Module):
    """Wide-ResNet U-Net with channel multipliers and GroupNorm.

    Reference: ``models/unets.py:67-183``.  Two ResidualBlocks per resolution
    on the way down (downsample between resolutions), MiddleBlock, then three
    ResidualBlocks per resolution on the way up, each consuming a skip.
    """

    time_window: int = 5
    input_fields: int = 4
    output_fields: int = 4
    hidden_channels: int = 32
    ch_mults: Sequence[int] = ()
    norm: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        del train  # no batch statistics in this model
        x = _fold_time(x)
        x = nn.Conv(self.hidden_channels, (1, 1), dtype=self.dtype, name="image_proj")(x)

        n_resolutions = len(self.ch_mults)
        skips = [x]
        in_ch = self.hidden_channels
        idx = 0
        for i in range(n_resolutions):
            out_ch = in_ch * self.ch_mults[i]
            for _ in range(2):
                x = ResidualBlock(
                    in_ch, out_ch, norm=self.norm, dtype=self.dtype, name=f"down{idx}"
                )(x)
                in_ch = out_ch
                skips.append(x)
                idx += 1
            if i < n_resolutions - 1:
                x = Downsample(in_ch, dtype=self.dtype, name=f"down{idx}")(x)
                skips.append(x)
                idx += 1

        x = MiddleBlock(in_ch, norm=self.norm, dtype=self.dtype, name="middle")(x)

        idx = 0
        for i in reversed(range(n_resolutions)):
            out_ch = in_ch
            for _ in range(2):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResidualBlock(
                    in_ch + out_ch, out_ch, norm=self.norm, dtype=self.dtype, name=f"up{idx}"
                )(x)
                idx += 1
            out_ch = in_ch // self.ch_mults[i]
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResidualBlock(
                in_ch + out_ch, out_ch, norm=self.norm, dtype=self.dtype, name=f"up{idx}"
            )(x)
            idx += 1
            in_ch = out_ch
            if i > 0:
                x = Upsample(in_ch, dtype=self.dtype, name=f"up{idx}")(x)
                idx += 1

        if self.norm:
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="final_norm")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            self.output_fields * self.time_window, (1, 1), dtype=self.dtype, name="final"
        )(x)
        return _unfold_time(x, self.time_window)


@register_model("unet_classic")
class ClassicUnet(nn.Module):
    """Classic 4-pool U-Net with BatchNorm blocks.

    Reference: ``models/unets.py:186-328``.  BatchNorm running statistics
    live in the ``batch_stats`` collection (pass ``mutable=['batch_stats']``
    and ``train=True`` during training).
    """

    time_window: int = 5
    input_fields: int = 4
    output_fields: int = 4
    hidden_channels: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hc = self.hidden_channels
        x = _fold_time(x)

        def pool(z):
            return nn.max_pool(z, window_shape=(2, 2), strides=(2, 2))

        enc1 = ClassicUnetBlock(hc, dtype=self.dtype, name="encoder1")(x, train)
        enc2 = ClassicUnetBlock(hc * 2, dtype=self.dtype, name="encoder2")(pool(enc1), train)
        enc3 = ClassicUnetBlock(hc * 4, dtype=self.dtype, name="encoder3")(pool(enc2), train)
        enc4 = ClassicUnetBlock(hc * 8, dtype=self.dtype, name="encoder4")(pool(enc3), train)

        bottleneck = ClassicUnetBlock(hc * 16, dtype=self.dtype, name="bottleneck")(
            pool(enc4), train
        )

        def upconv(z, ch, name):
            return nn.ConvTranspose(
                ch,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                transpose_kernel=True,
                dtype=self.dtype,
                name=name,
            )(z)

        dec4 = upconv(bottleneck, hc * 8, "upconv4")
        dec4 = ClassicUnetBlock(hc * 8, dtype=self.dtype, name="decoder4")(
            jnp.concatenate([dec4, enc4], axis=-1), train
        )
        dec3 = upconv(dec4, hc * 4, "upconv3")
        dec3 = ClassicUnetBlock(hc * 4, dtype=self.dtype, name="decoder3")(
            jnp.concatenate([dec3, enc3], axis=-1), train
        )
        dec2 = upconv(dec3, hc * 2, "upconv2")
        dec2 = ClassicUnetBlock(hc * 2, dtype=self.dtype, name="decoder2")(
            jnp.concatenate([dec2, enc2], axis=-1), train
        )
        dec1 = upconv(dec2, hc, "upconv1")
        dec1 = ClassicUnetBlock(hc, dtype=self.dtype, name="decoder1")(
            jnp.concatenate([dec1, enc1], axis=-1), train
        )

        x = nn.Conv(
            self.output_fields * self.time_window, (1, 1), dtype=self.dtype, name="final"
        )(dec1)
        return _unfold_time(x, self.time_window)

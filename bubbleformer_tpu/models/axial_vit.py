"""Axial vision transformers: AViT and FiLM-conditioned AViT.

TPU-native counterparts of reference ``bubbleformer/models/axial_vit.py``:

* ``SpaceTimeBlock`` (reference ``:13-65``): temporal attention followed by
  per-frame axial spatial attention.
* ``AViT`` (reference ``:68-151``): HMLPEmbed -> N SpaceTimeBlocks (drop-path
  linearly ramped 0 -> drop_path over blocks, reference ``:100``) -> HMLPDebed.
* ``FiLMAViT`` (reference ``:154-242``): AViT plus FiLM modulation of the
  post-embed features from a fluid-parameter vector.

TPU-first design decisions (not a translation of the torch module list):

* The processor stack is one ``nn.scan`` over a single compiled
  ``SpaceTimeBlock`` with the per-block drop-path rates fed as the scanned
  input.  One block body is traced/compiled once instead of N times; scanned
  parameters carry a leading ``layers`` axis (annotated for partitioning).
* Rematerialization (`jax.checkpoint`) per block is a first-class switch
  (``remat=True``), replacing the reference's commented-out
  ``torch.utils.checkpoint`` (reference ``:143``).
* Activations are channels-last internally; the public API keeps the
  reference's ``(B, T, C, H, W)`` layout.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bubbleformer_tpu.layers.attention import AxialAttentionBlock, TemporalAttentionBlock
from bubbleformer_tpu.layers.linear import FiLMMLP
from bubbleformer_tpu.layers.patching import HMLPDebed, HMLPEmbed
from bubbleformer_tpu.models._api import register_model

__all__ = ["SpaceTimeBlock", "AViT", "FiLMAViT"]


class SpaceTimeBlock(nn.Module):
    """Factored spacetime block: temporal attention then axial spatial attention.

    Carry layout for scanning: ``x`` is channels-last ``(B, T, H, W, C)``; the
    scanned input is this block's drop-path rate.
    """

    embed_dim: int = 768
    num_heads: int = 12
    attn_scale: bool = True
    feat_scale: bool = True
    bias_type: str = "rel"
    attn_impl: str = "auto"
    layer_scale_init_value: float = 1e-6
    deterministic: bool = True
    # Prefer the smallest saved-activation footprint when resolving 'auto'
    # (set by AViT when scan_blocks=True — the memory escape hatch).
    memory_lean: bool = False
    # Channel-major carry: x is (C, B, T, N) throughout the stack (see
    # AViT.carry); ``grid_hw`` carries the token grid the flat N folds.
    carry_cm: bool = False
    grid_hw: Optional[tuple] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, drop_path_rate: jax.Array | float):
        if self.carry_cm:
            c, b, t, n = x.shape
            x = TemporalAttentionBlock(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                attn_scale=self.attn_scale,
                bias_type=self.bias_type,
                attn_impl=self.attn_impl,
                layer_scale_init_value=self.layer_scale_init_value,
                carry_cm=True,
                dtype=self.dtype,
                name="temporal",
            )(x, drop_path_rate, self.deterministic)
            x = x.reshape(c, b * t, n)
            x = AxialAttentionBlock(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                attn_scale=self.attn_scale,
                feat_scale=self.feat_scale,
                bias_type=self.bias_type,
                attn_impl=self.attn_impl,
                layer_scale_init_value=self.layer_scale_init_value,
                carry_cm=True,
                grid_hw=self.grid_hw,
                dtype=self.dtype,
                name="spatial",
            )(x, drop_path_rate, self.deterministic)
            return x.reshape(c, b, t, n), None

        b, t, h, w, c = x.shape
        x = TemporalAttentionBlock(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            attn_scale=self.attn_scale,
            bias_type=self.bias_type,
            attn_impl=self.attn_impl,
            layer_scale_init_value=self.layer_scale_init_value,
            dtype=self.dtype,
            name="temporal",
        )(x, drop_path_rate, self.deterministic)

        x = x.reshape(b * t, h, w, c)
        x = AxialAttentionBlock(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            attn_scale=self.attn_scale,
            feat_scale=self.feat_scale,
            bias_type=self.bias_type,
            attn_impl=self.attn_impl,
            layer_scale_init_value=self.layer_scale_init_value,
            memory_lean=self.memory_lean,
            dtype=self.dtype,
            name="spatial",
        )(x, drop_path_rate, self.deterministic)
        x = x.reshape(b, t, h, w, c)
        return x, None


REMAT_POLICIES = {
    # Save matmul (dot) outputs AND the Pallas flash-attention outputs
    # (named 'flash_attn'), recompute elementwise/norm work in the backward
    # pass — the token grid is small (H/p x W/p), so the saved activations
    # are cheap and the recompute drops from ~1x forward FLOPs to near zero.
    "dots": jax.checkpoint_policies.save_from_both_policies(
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        jax.checkpoint_policies.save_only_these_names("flash_attn"),
    ),
    # Recompute everything (minimum memory, ~1x forward extra FLOPs).
    "full": None,
}


def _block_body(remat: bool, remat_policy: str = "dots"):
    """SpaceTimeBlock, optionally wrapped in per-block rematerialization."""
    if not remat:
        return SpaceTimeBlock
    return nn.remat(
        SpaceTimeBlock, prevent_cse=False, policy=REMAT_POLICIES.get(remat_policy)
    )


def _scanned_blocks(
    *,
    num_blocks: int,
    remat: bool,
    remat_policy: str = "dots",
    name: str = "blocks",
    **block_kwargs,
):
    """Build the scanned (optionally rematerialized) SpaceTimeBlock stack."""
    body = _block_body(remat, remat_policy)
    scanned = nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True, "droppath": True},
        in_axes=0,
        length=num_blocks,
        metadata_params={nn.meta.PARTITION_NAME: "layers"},
    )
    return scanned(name=name, **block_kwargs)


@register_model("avit")
class AViT(nn.Module):
    """Axial ViT for temporal bundling: (B, T, C_in, H, W) -> (B, T, C_out, H, W).

    Args mirror the reference constructor (``axial_vit.py:85-97``); ``remat``
    (default True) and ``scan_blocks`` (default False — measured slower on
    v5e, see the field comment) are TPU-build additions.  ``remat`` applies
    per-block on both the scanned and the unrolled paths.
    """

    input_fields: int = 3
    output_fields: int = 3
    time_window: int = 12
    patch_size: int = 16
    embed_dim: int = 768
    num_heads: int = 12
    processor_blocks: int = 12
    drop_path: float = 0.2
    attn_scale: bool = True
    feat_scale: bool = True
    bias_type: str = "rel"
    attn_impl: str = "auto"
    remat: bool = True
    remat_policy: str = "dots"
    # Unrolled by default: measured on v5e, nn.scan over the blocks costs
    # ~40% extra step time (identical per-iteration buffer layouts + no
    # cross-block fusion) while unrolled + dots-policy remat matches the
    # no-remat speed.  Flip on for compile-time-sensitive runs.
    scan_blocks: bool = False
    # Sequence/spatial parallelism: when set to a mesh axis name, token-grid
    # activations are sharded along the patch-row dimension between blocks;
    # GSPMD inserts the all-gathers column attention needs.
    spatial_shard_axis: Optional[str] = None
    # Processor-stack carry layout.  "cm" keeps activations in the lane
    # kernels' native channel-major (C, B, T, N) layout across all blocks,
    # deleting the per-block NHWC <-> (C, tokens) boundary transposes
    # (2 per temporal branch + 2 per axial branch, fwd and again in the
    # remat backward).  Measured on v5e at the flagship shape the cm carry
    # REGRESSES the step (172 ms vs 115.6 ms nhwc): the transposes it
    # deletes are worth ~8 ms, but XLA lays out the (C, B*T*N) glue ops
    # (InstanceNormCM / GeluMLPCM / FiLM) worse than their NHWC twins.
    # "auto" therefore resolves to nhwc until the cm glue is profiled and
    # fixed; "cm" stays available as an explicit opt-in (numerics are
    # pinned identical by tests/test_cm_carry.py).
    carry: str = "auto"
    dtype: Optional[jnp.dtype] = None

    def _maybe_shard_spatial(self, x: jax.Array) -> jax.Array:
        if self.spatial_shard_axis is None:
            return x
        from jax.sharding import PartitionSpec as P

        spec = P(None, None, self.spatial_shard_axis)
        return jax.lax.with_sharding_constraint(x, spec)

    def _encode(self, x: jax.Array) -> jax.Array:
        """(B, T, C, H, W) -> channels-last patch grid (B, T, h, w, E)."""
        b, t, c, hh, ww = x.shape
        if self.dtype is not None:
            # Cast BEFORE the NHWC relayout: the f32 batch would otherwise be
            # layout-copied at full width and converted afterwards (profiled
            # ~7 ms/step at the flagship); converting first halves the bytes
            # the relayout moves and fuses the convert into the copy.
            x = x.astype(self.dtype)
        if self.patch_size >= 2:
            # Fuse the NCHW->NHWC batch relayout with the first pyramid
            # stage's space-to-depth gather: ONE (dy, dx, c)-minor copy of
            # the full-resolution tensor instead of two (profiled ~5 ms/step
            # of separate transpose + 6-D s2d copies at the flagship).
            x = x.reshape(b * t, c, hh // 2, 2, ww // 2, 2)
            x = jnp.transpose(x, (0, 2, 4, 3, 5, 1)).reshape(
                b * t, hh // 2, ww // 2, 4 * c
            )
            prefolded = True
        else:
            x = jnp.transpose(x, (0, 1, 3, 4, 2))  # (B, T, H, W, C)
            x = x.reshape(b * t, hh, ww, c)
            prefolded = False
        x = HMLPEmbed(
            patch_size=self.patch_size,
            in_channels=self.input_fields,
            embed_dim=self.embed_dim,
            prefolded_input=prefolded,
            dtype=self.dtype,
            name="embed",
        )(x)
        return x.reshape(b, t, x.shape[1], x.shape[2], self.embed_dim)

    def _use_cm_carry(self, x: jax.Array) -> bool:
        """Decide the carry layout for this trace (see ``carry``)."""
        if self.carry == "nhwc" or self.spatial_shard_axis is not None:
            return False
        b, t, hh, ww, e = x.shape
        if (t * hh * ww) % 128:
            # The flat temporal kernel windows tn lanes per grid step; Mosaic
            # requires lane windows to be 128-aligned.
            return False
        if self.carry == "cm":
            return True
        # "auto": nhwc for now — the cm carry measured slower end-to-end on
        # v5e (see the ``carry`` attribute comment); revisit after profiling
        # the cm glue layouts.
        return False

    def _process(self, x: jax.Array, train: bool) -> jax.Array:
        dp_rates = jnp.asarray(
            np.linspace(0.0, self.drop_path, self.processor_blocks), dtype=jnp.float32
        )
        use_cm = self._use_cm_carry(x)
        block_kwargs = dict(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            attn_scale=self.attn_scale,
            feat_scale=self.feat_scale,
            bias_type=self.bias_type,
            attn_impl=self.attn_impl,
            # scan_blocks is the memory escape hatch: resolve 'auto' to the
            # impls with the smallest saved-dot footprint under remat.
            memory_lean=self.scan_blocks,
            deterministic=not train,
            dtype=self.dtype,
        )
        if use_cm:
            b, t, hh, ww, e = x.shape
            n = hh * ww
            # ONE boundary transpose into the kernels' native channel-major
            # layout (and one back below) instead of 4 per block.
            x = jnp.transpose(x.reshape(b * t * n, e), (1, 0)).reshape(
                e, b, t, n
            )
            block_kwargs.update(carry_cm=True, grid_hw=(hh, ww))
        x = self._maybe_shard_spatial(x)
        if self.scan_blocks:
            x, _ = _scanned_blocks(
                num_blocks=self.processor_blocks,
                remat=self.remat,
                remat_policy=self.remat_policy,
                **block_kwargs,
            )(x, dp_rates)
        else:
            body = _block_body(self.remat, self.remat_policy)
            for i in range(self.processor_blocks):
                x, _ = body(name=f"block{i}", **block_kwargs)(x, dp_rates[i])
                x = self._maybe_shard_spatial(x)
        if use_cm:
            x = jnp.transpose(x.reshape(e, b * t * n), (1, 0)).reshape(
                b, t, hh, ww, e
            )
        return x

    def _decode(self, x: jax.Array, output_layout: str = "nchw") -> jax.Array:
        """(B, T, h, w, E) -> (B, T, C_out, H, W) (or (B, T, H, W, C_out)).

        ``output_layout="nhwc"`` skips the channels-first output fold and
        returns the debed pyramid's native channels-last tensor — the
        training loss consumes it directly (``ForecastModule._loss_nhwc``)
        so no output relayout exists on the train path at all.  Same
        parameters either way (the fold is a pure shuffle).
        """
        b, t = x.shape[:2]
        x = x.reshape(b * t, x.shape[2], x.shape[3], self.embed_dim)
        emit_nchw = self.patch_size >= 2 and output_layout == "nchw"
        x = HMLPDebed(
            patch_size=self.patch_size,
            out_channels=self.output_fields,
            embed_dim=self.embed_dim,
            # Mirror of the encode-side fold: the last depth-to-space
            # shuffle emits channels-first directly, fusing the NHWC->NCHW
            # output relayout into the same copy.
            emit_nchw=emit_nchw,
            dtype=self.dtype,
            name="debed",
        )(x)
        if emit_nchw:
            return x.reshape(b, t, self.output_fields, x.shape[2], x.shape[3])
        x = x.reshape(b, t, x.shape[1], x.shape[2], self.output_fields)
        if output_layout == "nhwc":
            return x
        return jnp.transpose(x, (0, 1, 4, 2, 3))

    # ForecastModule checks this before passing output_layout (the U-Nets
    # have no layout-free decode stage).
    supports_output_layout = True

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, output_layout: str = "nchw"
    ) -> jax.Array:
        x = self._encode(x)
        x = self._process(x, train)
        return self._decode(x, output_layout)


@register_model("filmavit")
class FiLMAViT(AViT):
    """AViT with FiLM conditioning of post-embed features on fluid parameters.

    Reference: ``axial_vit.py:154-242`` — FiLM applied once after embedding.
    ``film_per_block=True`` additionally modulates after every SpaceTimeBlock
    (the reference scaffolds this but leaves it commented out,
    ``axial_vit.py:195-197,233-236``); off by default for parity.
    """

    num_fluid_params: int = 9
    film_per_block: bool = False

    @nn.compact
    def __call__(  # type: ignore[override]
        self,
        x: jax.Array,
        fluid_params: jax.Array,
        train: bool = False,
        output_layout: str = "nchw",
    ) -> jax.Array:
        x = self._encode(x)
        x = FiLMMLP(
            param_dim=self.num_fluid_params,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="film_embed",
        )(x, fluid_params)
        if self.film_per_block:
            # Per-block FiLM forces the unrolled path (each block gets its
            # own modulation parameters).
            dp_rates = np.linspace(0.0, self.drop_path, self.processor_blocks)
            block_kwargs = dict(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                attn_scale=self.attn_scale,
                feat_scale=self.feat_scale,
                bias_type=self.bias_type,
                attn_impl=self.attn_impl,
                memory_lean=self.scan_blocks,
                deterministic=not train,
                dtype=self.dtype,
            )
            x = self._maybe_shard_spatial(x)
            body = _block_body(self.remat, self.remat_policy)
            for i in range(self.processor_blocks):
                x, _ = body(name=f"block{i}", **block_kwargs)(
                    x, jnp.float32(dp_rates[i])
                )
                x = FiLMMLP(
                    param_dim=self.num_fluid_params,
                    embed_dim=self.embed_dim,
                    dtype=self.dtype,
                    name=f"film_block{i}",
                )(x, fluid_params)
                x = self._maybe_shard_spatial(x)
        else:
            x = self._process(x, train)
        return self._decode(x, output_layout)

"""Temporal and axial-spatial attention blocks (channels-last).

TPU-native counterparts of the reference blocks
(``bubbleformer/layers/attention.py:10-124`` temporal, ``:127-319`` axial):

* Activations are ``(..., H, W, C)`` so the 1x1-conv QKV/output heads become
  Dense matmuls on the MXU and InstanceNorm reduces over the two axes before
  the channel axis.
* The attn_scale low/high-frequency decomposition is computed in the
  algebraically fused form (see ``ops/attention.py``), never materializing
  the uniform-minus-softmax split.
* Drop-path rates are traced values so a stack of blocks compiles to a single
  ``lax.scan`` body (see ``models/axial_vit.py``).

Parameter layout intentionally differs from the torch reference (Dense
kernels instead of 1x1 Conv2d weights; per-head interleaving is handled by a
reshape) — semantics are equivalent, checkpoints are not interchangeable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from bubbleformer_tpu.layers.linear import GeluMLP, GeluMLPCM
from bubbleformer_tpu.layers.norm import (
    DenseParams,
    InstanceNorm,
    InstanceNormCM,
    LayerNormParams,
)
from bubbleformer_tpu.layers.positional import make_bias_module
from bubbleformer_tpu.layers.stochastic import drop_path
from bubbleformer_tpu.ops.attention import (
    axis_attention,
    packed_attention,
    unrolled_axis_attention,
)
from bubbleformer_tpu.ops.axial_block_mega import mega_axial_block
from bubbleformer_tpu.ops.axial_lane import (
    lane_axial_attention_cm,
    lane_axial_attention_from_x,
    lane_axial_supported,
)
from bubbleformer_tpu.ops.axial_fused import fused_axial_attention
from bubbleformer_tpu.ops.axial_fused_block import fused_block_attention
from bubbleformer_tpu.ops.axial_fused_packed import fused_axial_attention_packed
from bubbleformer_tpu.ops.axial_pallas import flash_packed_attention
from bubbleformer_tpu.ops.temporal_block_mega import (
    core_temporal_attention,
    core_temporal_supported,
    mega_temporal_block,
    mega_temporal_supported,
)


def _resolve_attn_impl(
    impl: str,
    seq_len: int,
    kind: str = "axial",
    shape: tuple[int, int, int, int] | None = None,
    memory_lean: bool = False,
) -> str:
    """Resolve the 'auto' attention implementation, shape- and kind-aware.

    Measured on v5e (512^2/patch-16 flagship, 12-block stacks, fwd+bwd):

    * temporal (T ~ 5): the whole-branch megakernel
      (``ops/temporal_block_mega.py``, lane-major (C, T*N) layout) runs the
      12-stack in 17.0 ms vs 49.1 for trace-time-``unrolled`` VPU
      multiply-reduces and 100.4 for plain batched dot_general — the XLA
      formulations are op-count/dispatch-bound on tiny-T attention.
    * axial (seq 32): the round-1 relayout-based kernels *lose* to plain
      (flash 120.7 / packed 140.5 vs plain 92.3 ms), and the natural-layout
      row+column kernels only drew level once the kernel boundary moved to
      the raw QKV tensor with qk-LayerNorm computed in-kernel
      (``fused_block``: depth-4 axial stack 30.4 ms vs plain 33.4 vs
      fused_packed 43.4 — ABLATIONS_r02.json).

    'auto' resolves: temporal -> mega on TPU when the shape fits its VMEM
    envelope (``mega_temporal_supported``), else unrolled for seq <= 8, else
    plain off-TPU or flash on TPU at seq >= 64; axial -> the lane-major
    chunk-matmul kernel (``ops/axial_lane.py``) on TPU when the shape fits
    its gate, else fused_block (plain off-TPU: interpret-mode pallas is
    orders slower and XLA:CPU fuses fine).  All impls remain directly
    selectable and numerically identical (golden tests).
    """
    if impl == "auto":
        import jax as _jax

        on_tpu = _jax.default_backend() == "tpu"
        if kind == "temporal":
            if (
                on_tpu
                and shape is not None
                and mega_temporal_supported(seq_len, *shape[1:])
            ):
                return "mega"
            if (
                on_tpu
                and shape is not None
                and core_temporal_supported(seq_len, *shape[1:])
            ):
                # Streamed core kernel (QKV+qk-LN+attention in-kernel,
                # IN/Dense in XLA): covers the shapes outside the whole-
                # branch megakernel's VMEM envelope (e.g. C=768 grids).
                return "core"
            if seq_len <= 8:
                return "unrolled"
            return "flash" if on_tpu and seq_len >= 64 else "plain"
        if not on_tpu:
            return "plain"
        if memory_lean:
            # Memory-constrained configs (scan_blocks=True is the OOM escape
            # hatch): route lane with its BATCHED-dot projection boundary
            # (lane_axial_attention_from_x(lean=True)) — under the "dots"
            # remat policy only the C-wide kernel output is saved per block,
            # vs fused_block's saved 3C-wide QKV dot.  (Round 4 routed
            # fused_block here because the non-lean lane boundary saved two
            # (3C, BT*N) projection dots and OOM'd b8-scan; the lean
            # boundary removes both, see DESIGN.md.)
            if shape is not None and lane_axial_supported(*shape):
                return "lane"
            return "fused_block"
        if shape is not None and lane_axial_supported(*shape):
            return "lane"
        return "fused_block"
    return impl


_PACKED_IMPLS = {"packed": packed_attention, "flash": flash_packed_attention}


class TemporalAttentionBlock(nn.Module):
    """Self-attention over the time axis at every spatial token.

    Input/output: ``(B, T, H, W, C)``.  Matches reference ``AttentionBlock``:
    InstanceNorm pre/post-norm, per-head LayerNorm on q and k, T5 relative
    position bias over T, learned per-head high-frequency attention scaling,
    LayerScale gamma and DropPath on the residual branch.
    """

    embed_dim: int = 768
    num_heads: int = 12
    layer_scale_init_value: float = 1e-6
    bias_type: str = "rel"
    attn_scale: bool = True
    attn_impl: str = "auto"  # "auto" | "flash" (Pallas) | "packed" | "plain"
    # Channel-major carry (models/axial_vit.py carry="cm"): __call__ takes
    # and returns (C, B, T, N) and the whole branch runs through the
    # megakernel with zero boundary transposes.
    carry_cm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        drop_path_rate: jax.Array | float = 0.0,
        deterministic: bool = True,
    ) -> jax.Array:
        heads = self.num_heads
        if self.carry_cm:
            c, b, t, n = x.shape
            d = c // heads
            inp = x
            bias_mod = make_bias_module(self.bias_type, heads)
            bias = bias_mod(t, t) if bias_mod is not None else None
            scale = (
                self.param("attn_scale_factor", nn.initializers.ones, (heads,))
                if self.attn_scale
                else None
            )
            in1_s, in1_b = LayerNormParams(self.embed_dim, name="norm1")()
            wqkv, bqkv = DenseParams(c, 3 * self.embed_dim, name="input_head")()
            qn_scale, qn_bias = LayerNormParams(d, name="qnorm")()
            kn_scale, kn_bias = LayerNormParams(d, name="knorm")()
            in2_s, in2_b = LayerNormParams(self.embed_dim, name="norm2")()
            wout, bout = DenseParams(
                self.embed_dim, self.embed_dim, name="output_head"
            )()
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.embed_dim,),
            )
            xin = x if self.dtype is None else x.astype(self.dtype)
            branch = mega_temporal_block(
                xin.reshape(c, b * t * n), in1_s, in1_b, wqkv, bqkv,
                qn_scale, qn_bias, kn_scale, kn_bias, in2_s, in2_b,
                wout * gamma[None, :], bout * gamma, bias, scale,
                heads=heads, cm_dims=(b, t),
            ).reshape(c, b, t, n)
            rng = None if deterministic else self.make_rng("droppath")
            return (
                drop_path(branch, drop_path_rate, rng, deterministic,
                          batch_axis=1)
                + inp
            )

        b, t, h, w, c = x.shape
        d = c // heads
        inp = x

        impl = _resolve_attn_impl(
            self.attn_impl, t, kind="temporal", shape=(t, h, w, c)
        )
        if impl == "mega":
            # Whole-branch megakernel (ops/temporal_block_mega.py): IN1 ->
            # QKV Dense -> qk-LN -> T-attention -> IN2 -> output Dense in one
            # pallas_call.  Parameter paths match the XLA path below, so
            # checkpoints interchange across attn_impl settings.
            bias_mod = make_bias_module(self.bias_type, heads)
            bias = bias_mod(t, t) if bias_mod is not None else None
            scale = (
                self.param("attn_scale_factor", nn.initializers.ones, (heads,))
                if self.attn_scale
                else None
            )
            in1_s, in1_b = LayerNormParams(self.embed_dim, name="norm1")()
            wqkv, bqkv = DenseParams(c, 3 * self.embed_dim, name="input_head")()
            qn_scale, qn_bias = LayerNormParams(d, name="qnorm")()
            kn_scale, kn_bias = LayerNormParams(d, name="knorm")()
            in2_s, in2_b = LayerNormParams(self.embed_dim, name="norm2")()
            wout, bout = DenseParams(
                self.embed_dim, self.embed_dim, name="output_head"
            )()
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.embed_dim,),
            )
            xin = x if self.dtype is None else x.astype(self.dtype)
            # LayerScale folds into the output projection exactly
            # (Dense(y) * gamma == y @ (W * gamma) + b * gamma), saving one
            # full-tensor multiply per block; gamma's gradient flows through
            # the scaled-weight VJP in f32.
            branch = mega_temporal_block(
                xin, in1_s, in1_b, wqkv, bqkv, qn_scale, qn_bias, kn_scale,
                kn_bias, in2_s, in2_b, wout * gamma[None, :], bout * gamma,
                bias, scale, heads=heads,
            )
            rng = None if deterministic else self.make_rng("droppath")
            return drop_path(branch, drop_path_rate, rng, deterministic) + inp

        x = InstanceNorm(self.embed_dim, name="norm1")(x)

        bias_mod = make_bias_module(self.bias_type, heads)
        bias = bias_mod(t, t) if bias_mod is not None else None
        scale = (
            self.param("attn_scale_factor", nn.initializers.ones, (heads,))
            if self.attn_scale
            else None
        )
        if impl == "core":
            # Streamed core kernel: QKV Dense + qk-LN + T-attention in one
            # pallas_call chunked over tokens (ops/temporal_block_mega.py);
            # IN2/output Dense below stay in XLA.  Parameter paths match the
            # other impls, so checkpoints interchange.
            wqkv, bqkv = DenseParams(c, 3 * self.embed_dim, name="input_head")()
            qn_scale, qn_bias = LayerNormParams(d, name="qnorm")()
            kn_scale, kn_bias = LayerNormParams(d, name="knorm")()
            xin = x if self.dtype is None else x.astype(self.dtype)
            out = core_temporal_attention(
                xin, wqkv, bqkv, qn_scale, qn_bias, kn_scale, kn_bias,
                bias, scale, heads=heads,
            )
            out = InstanceNorm(self.embed_dim, name="norm2")(out)
            out = nn.Dense(self.embed_dim, dtype=self.dtype, name="output_head")(out)
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.embed_dim,),
            )
            branch = out * gamma.astype(out.dtype)
            rng = None if deterministic else self.make_rng("droppath")
            return drop_path(branch, drop_path_rate, rng, deterministic) + inp

        qkv = nn.Dense(3 * self.embed_dim, dtype=self.dtype, name="input_head")(x)
        qkv = qkv.reshape(b, t, h, w, heads, 3 * d)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (b, t, h, w, heads, d)
        # qk-LayerNorm computes in f32 (param dtype); cast back to the
        # activation dtype so the attention kernels see uniform q/k/v dtypes.
        q = nn.LayerNorm(epsilon=1e-5, name="qnorm")(q).astype(qkv.dtype)
        k = nn.LayerNorm(epsilon=1e-5, name="knorm")(k).astype(qkv.dtype)

        if impl in _PACKED_IMPLS:
            # (b, t, h, w, he, d) -> (he, b*h*w, t, d), pack tiny T-sequences
            # into MXU-sized super-sequences (see ops.packed_attention /
            # ops.axial_pallas).
            def to_packed(a):
                return jnp.transpose(a, (4, 0, 2, 3, 1, 5)).reshape(
                    heads, b * h * w, t, d
                )

            out = _PACKED_IMPLS[impl](
                to_packed(q), to_packed(k), to_packed(v), bias=bias, scale_factor=scale
            )
            out = out.reshape(heads, b, h, w, t, d)
            out = jnp.transpose(out, (1, 4, 2, 3, 0, 5)).reshape(b, t, h, w, c)
        elif impl == "unrolled":
            # Trace-time-unrolled T^2 logit pairs: pure VPU multiply-reduces
            # over the (b, h, w, heads) batch, output already in input layout.
            out = unrolled_axis_attention(q, k, v, axis=1, bias=bias, scale_factor=scale)
            out = out.reshape(b, t, h, w, c)
        else:
            # Attention over the T axis directly on the (b, t, h, w, heads, d)
            # layout — dot_general batches (b, h, w, heads) without relayouts.
            out = axis_attention(q, k, v, axis=1, bias=bias, scale_factor=scale)
            # out: (b, h, w, heads, t, d) -> (b, t, h, w, c)
            out = jnp.transpose(out, (0, 4, 1, 2, 3, 5)).reshape(b, t, h, w, c)
        out = InstanceNorm(self.embed_dim, name="norm2")(out)
        out = nn.Dense(self.embed_dim, dtype=self.dtype, name="output_head")(out)

        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init_value),
            (self.embed_dim,),
        )
        branch = out * gamma.astype(out.dtype)
        rng = None if deterministic else self.make_rng("droppath")
        return drop_path(branch, drop_path_rate, rng, deterministic) + inp


class AxialAttentionBlock(nn.Module):
    """Row + column axial attention, averaged, followed by a GeluMLP.

    Input/output: ``(B, H, W, C)`` (time already folded into batch).  Matches
    reference ``AxialAttentionBlock``: one shared QKV projection feeds both
    axes, one shared T5 bias table is evaluated at both lengths, separate
    per-head attention scales per axis, per-channel low/high feature-frequency
    rescaling, LayerScale + DropPath on both residual branches.
    """

    embed_dim: int = 768
    num_heads: int = 12
    layer_scale_init_value: float = 1e-6
    bias_type: str = "rel"
    attn_scale: bool = True
    feat_scale: bool = True
    attn_impl: str = "auto"  # "auto" | "flash" (Pallas) | "packed" | "plain"
    # Memory-constrained resolution hint (set by AViT when scan_blocks=True):
    # 'auto' prefers the impl with the smallest saved-activation footprint
    # under the dots remat policy over the fastest one.
    memory_lean: bool = False
    # Channel-major carry (models/axial_vit.py carry="cm"): __call__ takes
    # and returns (C, BT, N); ``grid_hw`` supplies the token grid the flat
    # token axis folds.
    carry_cm: bool = False
    grid_hw: tuple[int, int] | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        drop_path_rate: jax.Array | float = 0.0,
        deterministic: bool = True,
    ) -> jax.Array:
        heads = self.num_heads
        if self.carry_cm:
            c, bt, n = x.shape
            d = c // heads
            h, w = self.grid_hw
            inp = x
            bias_mod = make_bias_module(self.bias_type, heads)
            bias_x = bias_mod(w, w) if bias_mod is not None else None
            scale_x = (
                self.param("attn_scale_factor_x", nn.initializers.ones, (heads,))
                if self.attn_scale
                else None
            )
            bias_y = bias_mod(h, h) if bias_mod is not None else None
            scale_y = (
                self.param("attn_scale_factor_y", nn.initializers.ones, (heads,))
                if self.attn_scale
                else None
            )
            x = InstanceNormCM(self.embed_dim, name="norm1")(x)
            wqkv, bqkv = DenseParams(c, 3 * self.embed_dim, name="input_head")()
            qn_scale, qn_bias = LayerNormParams(d, name="qnorm")()
            kn_scale, kn_bias = LayerNormParams(d, name="knorm")()
            xin = x if self.dtype is None else x.astype(self.dtype)
            y = lane_axial_attention_cm(
                xin.reshape(c, bt * n), wqkv, bqkv, qn_scale, qn_bias,
                kn_scale, kn_bias, bias_x, bias_y, scale_x, scale_y,
                heads=heads, h=h, w=w,
            )
            y = InstanceNormCM(self.embed_dim, name="norm2")(
                y.reshape(c, bt, n)
            )
            wo, bo = DenseParams(
                self.embed_dim, self.embed_dim, name="output_head"
            )()
            dt = self.dtype or y.dtype
            y2 = jax.lax.dot_general(
                wo.astype(dt), y.reshape(c, bt * n).astype(dt),
                (((0,), (0,)), ((), ())),
            ) + bo.astype(dt)[:, None]
            x = y2.reshape(c, bt, n)
            return self._epilogue_cm(x, inp, drop_path_rate, deterministic)

        b, h, w, c = x.shape
        d = c // heads
        inp = x

        impl = _resolve_attn_impl(
            self.attn_impl, max(h, w), kind="axial", shape=(h, w, c, heads),
            memory_lean=self.memory_lean,
        )
        bias_mod = make_bias_module(self.bias_type, heads)
        bias_x = bias_mod(w, w) if bias_mod is not None else None
        scale_x = (
            self.param("attn_scale_factor_x", nn.initializers.ones, (heads,))
            if self.attn_scale
            else None
        )
        bias_y = bias_mod(h, h) if bias_mod is not None else None
        scale_y = (
            self.param("attn_scale_factor_y", nn.initializers.ones, (heads,))
            if self.attn_scale
            else None
        )

        if impl == "mega":
            # v4 megakernel: the entire branch (InstanceNorm1 -> QKV Dense ->
            # qk-LN -> axial attention -> InstanceNorm2 -> output Dense) runs
            # in one pallas_call (ops/axial_block_mega.py).  All parameter
            # paths match the XLA impls, so checkpoints interchange.
            in1_s, in1_b = LayerNormParams(self.embed_dim, name="norm1")()
            wqkv, bqkv = DenseParams(c, 3 * self.embed_dim, name="input_head")()
            qn_scale, qn_bias = LayerNormParams(d, name="qnorm")()
            kn_scale, kn_bias = LayerNormParams(d, name="knorm")()
            in2_s, in2_b = LayerNormParams(self.embed_dim, name="norm2")()
            wout, bout = DenseParams(
                self.embed_dim, self.embed_dim, name="output_head"
            )()
            xin = x if self.dtype is None else x.astype(self.dtype)
            x = mega_axial_block(
                xin, in1_s, in1_b, wqkv, bqkv, qn_scale, qn_bias, kn_scale,
                kn_bias, in2_s, in2_b, wout, bout, bias_x, bias_y, scale_x,
                scale_y, heads=heads,
            )
            return self._epilogue(x, inp, drop_path_rate, deterministic)

        x = InstanceNorm(self.embed_dim, name="norm1")(x)
        if impl == "lane":
            # v5/v6 kernel, fed from the block input: the QKV projection is
            # computed per lane-major layout in XLA so the dual-layout
            # boundary relayouts the C-wide input instead of the 3C-wide
            # QKV tensor (ops/axial_lane.py:lane_axial_attention_from_x).
            wqkv, bqkv = DenseParams(c, 3 * self.embed_dim, name="input_head")()
            qn_scale, qn_bias = LayerNormParams(d, name="qnorm")()
            kn_scale, kn_bias = LayerNormParams(d, name="knorm")()
            xin = x if self.dtype is None else x.astype(self.dtype)
            x = lane_axial_attention_from_x(
                xin, wqkv, bqkv, qn_scale, qn_bias, kn_scale, kn_bias,
                bias_x, bias_y, scale_x, scale_y, heads=heads,
                # Memory-lean boundary: batched projection dots the remat
                # policy recomputes instead of saving (scan_blocks configs).
                lean=self.memory_lean,
            )
            x = InstanceNorm(self.embed_dim, name="norm2")(x)
            x = nn.Dense(self.embed_dim, dtype=self.dtype, name="output_head")(x)
            return self._epilogue(x, inp, drop_path_rate, deterministic)

        qkv = nn.Dense(3 * self.embed_dim, dtype=self.dtype, name="input_head")(x)
        if impl == "fused_block":
            # qk-LayerNorm runs inside the v3 kernel; only declare its
            # params here (paths identical to nn.LayerNorm, so checkpoints
            # interchange across attn_impl settings).
            qn_scale, qn_bias = LayerNormParams(d, name="qnorm")()
            kn_scale, kn_bias = LayerNormParams(d, name="knorm")()
        else:
            qkv5 = qkv.reshape(b, h, w, heads, 3 * d)
            q, k, v = jnp.split(qkv5, 3, axis=-1)  # (b, h, w, heads, d)
            q = nn.LayerNorm(epsilon=1e-5, name="qnorm")(q).astype(qkv.dtype)
            k = nn.LayerNorm(epsilon=1e-5, name="knorm")(k).astype(qkv.dtype)

        # Row (x-direction) attention: sequence along W, (b, h, heads) batched
        # directly on the (b, h, w, heads, d) layout.
        if impl == "fused_block":
            # v3 kernel: consumes the raw interleaved (BT,H,W,3C) QKV tensor
            # and runs qk-LayerNorm in-kernel (ops/axial_fused_block.py) —
            # no split/LN/concat materialization at the kernel boundary.
            x = fused_block_attention(
                qkv, qn_scale, qn_bias, kn_scale, kn_bias,
                bias_x, bias_y, scale_x, scale_y, heads=heads,
            ).reshape(b, h, w, c)
        elif impl in ("fused", "fused_packed"):
            # One kernel launch computes rows AND columns from the natural
            # layout and writes the averaged result (ops/axial_fused.py) —
            # zero relayouts, shared q/k/v loads, VMEM-resident logits.
            # "fused_packed" additionally packs all heads block-diagonally
            # into each matmul (ops/axial_fused_packed.py) — heads x fewer
            # MXU issues on this op-count-bound device.
            kernel = (
                fused_axial_attention_packed
                if impl == "fused_packed"
                else fused_axial_attention
            )
            x = kernel(q, k, v, bias_x, bias_y, scale_x, scale_y).reshape(b, h, w, c)
        elif impl == "unrolled":
            xx = unrolled_axis_attention(q, k, v, axis=2, bias=bias_x, scale_factor=scale_x)
            xx = xx.reshape(b, h, w, c)
        elif impl in _PACKED_IMPLS:
            def pack_rows(a):  # (b, h, w, he, d) -> (he, b*h, w, d)
                return jnp.transpose(a, (3, 0, 1, 2, 4)).reshape(heads, b * h, w, d)

            xx = _PACKED_IMPLS[impl](
                pack_rows(q), pack_rows(k), pack_rows(v), bias=bias_x, scale_factor=scale_x
            )
            xx = jnp.transpose(xx.reshape(heads, b, h, w, d), (1, 2, 3, 0, 4)).reshape(
                b, h, w, c
            )
        else:
            xx = axis_attention(q, k, v, axis=2, bias=bias_x, scale_factor=scale_x)
            # xx: (b, h, heads, w, d) -> (b, h, w, c)
            xx = jnp.transpose(xx, (0, 1, 3, 2, 4)).reshape(b, h, w, c)

        # Column (y-direction) attention: sequence along H, (b, w, heads)
        # batched (the fused path above already included columns).
        if impl in ("fused", "fused_packed", "fused_block", "lane"):
            pass
        elif impl == "unrolled":
            xy = unrolled_axis_attention(q, k, v, axis=1, bias=bias_y, scale_factor=scale_y)
            xy = xy.reshape(b, h, w, c)
        elif impl in _PACKED_IMPLS:
            def pack_cols(a):  # (b, h, w, he, d) -> (he, b*w, h, d)
                return jnp.transpose(a, (3, 0, 2, 1, 4)).reshape(heads, b * w, h, d)

            xy = _PACKED_IMPLS[impl](
                pack_cols(q), pack_cols(k), pack_cols(v), bias=bias_y, scale_factor=scale_y
            )
            xy = jnp.transpose(xy.reshape(heads, b, w, h, d), (1, 3, 2, 0, 4)).reshape(
                b, h, w, c
            )
        else:
            xy = axis_attention(q, k, v, axis=1, bias=bias_y, scale_factor=scale_y)
            # xy: (b, w, heads, h, d) -> (b, h, w, c)
            xy = jnp.transpose(xy, (0, 3, 1, 2, 4)).reshape(b, h, w, c)

        if impl not in ("fused", "fused_packed", "fused_block", "lane"):
            x = (xx + xy) * 0.5
        x = InstanceNorm(self.embed_dim, name="norm2")(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="output_head")(x)
        return self._epilogue(x, inp, drop_path_rate, deterministic)

    def _epilogue_cm(self, x, inp, drop_path_rate, deterministic):
        """Channel-major twin of :meth:`_epilogue` for ``(C, BT, N)``
        activations: identical math and parameter paths, reductions over
        the trailing token axis, per-channel scalars broadcast as columns."""
        if self.feat_scale:
            low = self.param(
                "low_freq_scalar", nn.initializers.zeros, (self.embed_dim,)
            )
            high = self.param(
                "high_freq_scalar", nn.initializers.zeros, (self.embed_dim,)
            )
            x_low = jnp.mean(x, axis=-1, keepdims=True)
            x_high = x - x_low
            x = (
                x
                + x_low * low[:, None, None].astype(x.dtype)
                + x_high * high[:, None, None].astype(x.dtype)
            )

        gamma_att = self.param(
            "gamma_att",
            nn.initializers.constant(self.layer_scale_init_value),
            (self.embed_dim,),
        )
        rng = None if deterministic else self.make_rng("droppath")
        x = (
            drop_path(
                x * gamma_att[:, None, None].astype(x.dtype),
                drop_path_rate, rng, deterministic, batch_axis=1,
            )
            + inp
        )

        inp2 = x
        y = GeluMLPCM(self.embed_dim, dtype=self.dtype, name="mlp")(x)
        y = InstanceNormCM(self.embed_dim, name="mlp_norm")(y)
        gamma_mlp = self.param(
            "gamma_mlp",
            nn.initializers.constant(self.layer_scale_init_value),
            (self.embed_dim,),
        )
        rng2 = None if deterministic else self.make_rng("droppath")
        return inp2 + drop_path(
            gamma_mlp[:, None, None].astype(y.dtype) * y,
            drop_path_rate, rng2, deterministic, batch_axis=1,
        )

    def _epilogue(self, x, inp, drop_path_rate, deterministic):
        """feat_scale + LayerScale/DropPath residual + MLP sub-block (shared
        by the XLA paths and the megakernel, which ends at the output Dense).
        Plain helper invoked from the compact ``__call__`` so its params land
        in the module scope."""
        if self.feat_scale:
            low = self.param("low_freq_scalar", nn.initializers.zeros, (self.embed_dim,))
            high = self.param("high_freq_scalar", nn.initializers.zeros, (self.embed_dim,))
            x_low = jnp.mean(x, axis=(1, 2), keepdims=True)
            x_high = x - x_low
            x = x + x_low * low.astype(x.dtype) + x_high * high.astype(x.dtype)

        gamma_att = self.param(
            "gamma_att",
            nn.initializers.constant(self.layer_scale_init_value),
            (self.embed_dim,),
        )
        rng = None if deterministic else self.make_rng("droppath")
        x = drop_path(x * gamma_att.astype(x.dtype), drop_path_rate, rng, deterministic) + inp

        # MLP sub-block.
        inp2 = x
        y = GeluMLP(self.embed_dim, dtype=self.dtype, name="mlp")(x)
        y = InstanceNorm(self.embed_dim, name="mlp_norm")(y)
        gamma_mlp = self.param(
            "gamma_mlp",
            nn.initializers.constant(self.layer_scale_init_value),
            (self.embed_dim,),
        )
        rng2 = None if deterministic else self.make_rng("droppath")
        return inp2 + drop_path(gamma_mlp.astype(y.dtype) * y, drop_path_rate, rng2, deterministic)

"""Pallas TPU kernel v3: head-packed axial attention fused with qk-LayerNorm,
consuming the raw interleaved QKV projection output.

`ABLATIONS_r02.json` showed the head-packed attention op itself is fast (fwd
1.9 + bwd 2.3 ms at the flagship shape vs ~6.3 ms for the XLA plain path's
in-block share) but loses in-block to **XLA boundary materialization**: a
pallas call needs dense contiguous operands, so the three strided qkv-split
slices, the qk-LayerNorm casts, and the backward dq/dk/dv -> dqkv concat
each materialize full (BT, H, W, C) tensors that XLA would fuse away when
the consumer is a dot_general.  This kernel moves the boundary outward:

* input is the **single** ``(BT, H, W, 3C)`` QKV projection output exactly
  as the Dense layer writes it (per-head ``[q|k|v]`` interleave from the
  ``(…, heads, 3d)`` reshape) — no split, no slicing, no extra copies;
* **qk-LayerNorm runs inside the kernel** during head staging (f32 stats
  over the head dim, affine params shared across heads — flax
  ``LayerNorm(epsilon=1e-5)`` semantics, fast-variance form), with its
  backward hand-written in the kernel epilogue;
* the backward emits one ``(BT, H, W, 3C)`` dqkv tensor that feeds the
  Dense VJP matmul directly, plus the LN affine grads ``(4, d)``.

Attention math, head packing, in-kernel bias construction, and the window-
mean treatment of the attn_scale uniform component are inherited from
``ops/axial_fused_packed.py``; this file only changes what crosses the
kernel boundary.  Selectable as ``attn_impl='fused_block'``; parameter
paths (``qnorm/{scale,bias}``, ``knorm/{scale,bias}``) match the XLA
impls, so checkpoints are interchangeable across implementations.
"""
from __future__ import annotations

import functools

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bubbleformer_tpu.ops.axial_fused import _chunk_windows
from bubbleformer_tpu.ops.axial_fused_packed import (
    _HIGH,
    _build_col_bias,
    _build_row_bias,
    _bwd_chunk,
    _smem_scale_col,
    _win_mean_cols,
    _win_mean_rows,
)

_LN_EPS = 1e-5


def _ln_stats(x32: jax.Array):
    """Fast-variance LayerNorm stats over the last axis (flax semantics)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return (x32 - mu) * inv, inv


def _stage_ln(qkv_ref, ln_ref, q_s, k_s, v_s, qhat_s, khat_s, qinv_s, kinv_s,
              heads, d):
    """Per-head staging with in-kernel qk-LayerNorm.

    Writes post-LN q/k and raw v into the attention scratches; keeps the
    normalized-but-unaffine x-hat and inverse sigma for the LN backward
    (pass None refs in the forward to skip saving)."""
    for hd in range(heads):
        base = hd * 3 * d
        q_raw = qkv_ref[0, :, :, base : base + d].astype(jnp.float32)
        k_raw = qkv_ref[0, :, :, base + d : base + 2 * d].astype(jnp.float32)
        qhat, qinv = _ln_stats(q_raw)
        khat, kinv = _ln_stats(k_raw)
        q_s[hd] = (qhat * ln_ref[0:1, :] + ln_ref[1:2, :]).astype(q_s.dtype)
        k_s[hd] = (khat * ln_ref[2:3, :] + ln_ref[3:4, :]).astype(k_s.dtype)
        v_s[hd] = qkv_ref[0, :, :, base + 2 * d : base + 3 * d].astype(v_s.dtype)
        if qhat_s is not None:
            qhat_s[hd] = qhat
            khat_s[hd] = khat
            qinv_s[hd] = qinv[:, :, 0]
            kinv_s[hd] = kinv[:, :, 0]


def _fwd_kernel(
    scale_ref, qkv_ref, ln_ref, bx_ref, by_ref, r_ref, o_ref,
    q_s, k_s, v_s, o_s, br_s, bc_s,
    *, h, w, heads, d, gr, wc,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        _build_row_bias(br_s, bx_ref, heads, gr, w)
        _build_col_bias(bc_s, by_ref, r_ref, heads, h, wc)

    _stage_ln(qkv_ref, ln_ref, q_s, k_s, v_s, None, None, None, None, heads, d)

    scaling = d**-0.5
    sx_col = _smem_scale_col(scale_ref, heads, 0, gr * w)
    sy_col = _smem_scale_col(scale_ref, heads, 1, h * wc)

    for ci in range(h // gr):
        sl = slice(ci * gr, (ci + 1) * gr)
        qc = q_s[:, sl].reshape(heads * gr * w, d)
        kc = k_s[:, sl].reshape(heads * gr * w, d)
        vc = v_s[:, sl].reshape(heads * gr * w, d)
        s_mat = jax.lax.dot_general(
            qc, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s_mat = s_mat * scaling + br_s[...]
        p = jax.nn.softmax(s_mat, axis=-1)
        pv = jnp.dot(p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
        vm = _win_mean_rows(vc.astype(jnp.float32), heads * gr, w, d)
        o = sx_col * pv + (1.0 - sx_col) * vm
        o_s[:, sl] = (0.5 * o).reshape(heads, gr, w, d).astype(o_s.dtype)

    for ci in range(w // wc):
        sl = slice(ci * wc, (ci + 1) * wc)
        qc = q_s[:, :, sl].reshape(heads * h * wc, d)
        kc = k_s[:, :, sl].reshape(heads * h * wc, d)
        vc = v_s[:, :, sl].reshape(heads * h * wc, d)
        s_mat = jax.lax.dot_general(
            qc, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s_mat = s_mat * scaling + bc_s[...]
        p = jax.nn.softmax(s_mat, axis=-1)
        pv = jnp.dot(p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
        vm = _win_mean_cols(vc.astype(jnp.float32), heads, h, wc, d)
        o = sy_col * pv + (1.0 - sy_col) * vm
        o_s[:, :, sl] += (0.5 * o).reshape(heads, h, wc, d).astype(o_s.dtype)

    for hd in range(heads):
        ch = slice(hd * d, (hd + 1) * d)
        o_ref[0, :, :, ch] = o_s[hd].astype(o_ref.dtype)


def _bwd_kernel(
    scale_ref, qkv_ref, ln_ref, bx_ref, by_ref, r_ref, do_ref,
    dqkv_ref, dln_ref, dbx_ref, dby_ref, dscale_ref,
    q_s, k_s, v_s, do_s, dq_s, dk_s, dv_s,
    qhat_s, khat_s, qinv_s, kinv_s, br_s, bc_s, dbr_s, dbc_s,
    *, h, w, heads, d, gr, wc,
):
    b = pl.program_id(0)
    nr, nc = heads * gr * w, heads * h * wc

    @pl.when(b == 0)
    def _():
        _build_row_bias(br_s, bx_ref, heads, gr, w)
        _build_col_bias(bc_s, by_ref, r_ref, heads, h, wc)
        dbr_s[...] = jnp.zeros((nr, nr), jnp.float32)
        dbc_s[...] = jnp.zeros((nc, nc), jnp.float32)
        dscale_ref[...] = jnp.zeros_like(dscale_ref[...])
        dln_ref[...] = jnp.zeros_like(dln_ref[...])

    _stage_ln(qkv_ref, ln_ref, q_s, k_s, v_s, qhat_s, khat_s, qinv_s, kinv_s,
              heads, d)
    for hd in range(heads):
        ch = slice(hd * d, (hd + 1) * d)
        do_s[hd] = do_ref[0, :, :, ch]

    sx_col = _smem_scale_col(scale_ref, heads, 0, gr * w)
    sy_col = _smem_scale_col(scale_ref, heads, 1, h * wc)

    dsx = jnp.zeros((nr, 1), jnp.float32)
    dbr_acc = jnp.zeros((nr, nr), jnp.float32)
    for ci in range(h // gr):
        sl = slice(ci * gr, (ci + 1) * gr)
        shp = (heads, gr, w, d)
        dq, dk, dv, dsm, dsr = _bwd_chunk(
            q_s[:, sl].reshape(nr, d),
            k_s[:, sl].reshape(nr, d),
            v_s[:, sl].reshape(nr, d),
            (do_s[:, sl].reshape(nr, d).astype(jnp.float32) * 0.5
             ).astype(do_s.dtype),
            br_s[...],
            sx_col,
            float(w),
            d,
            lambda x: _win_mean_rows(x, heads * gr, w, d),
        )
        dq_s[:, sl] = dq.reshape(shp).astype(dq_s.dtype)
        dk_s[:, sl] = dk.reshape(shp).astype(dk_s.dtype)
        dv_s[:, sl] = dv.reshape(shp).astype(dv_s.dtype)
        dbr_acc = dbr_acc + dsm
        dsx += dsr
    dbr_s[...] += dbr_acc

    dsy = jnp.zeros((nc, 1), jnp.float32)
    dbc_acc = jnp.zeros((nc, nc), jnp.float32)
    for ci in range(w // wc):
        sl = slice(ci * wc, (ci + 1) * wc)
        shp = (heads, h, wc, d)
        dq, dk, dv, dsm, dsr = _bwd_chunk(
            q_s[:, :, sl].reshape(nc, d),
            k_s[:, :, sl].reshape(nc, d),
            v_s[:, :, sl].reshape(nc, d),
            (do_s[:, :, sl].reshape(nc, d).astype(jnp.float32) * 0.5
             ).astype(do_s.dtype),
            bc_s[...],
            sy_col,
            float(h),
            d,
            lambda x: _win_mean_cols(x, heads, h, wc, d),
        )
        dq_s[:, :, sl] += dq.reshape(shp).astype(dq_s.dtype)
        dk_s[:, :, sl] += dk.reshape(shp).astype(dk_s.dtype)
        dv_s[:, :, sl] += dv.reshape(shp).astype(dv_s.dtype)
        dbc_acc = dbc_acc + dsm
        dsy += dsr
    dbc_s[...] += dbc_acc

    dscale_ref[0, :] += jnp.sum(dsx.reshape(heads, gr * w), axis=1)
    dscale_ref[1, :] += jnp.sum(dsy.reshape(heads, h * wc), axis=1)

    # LN backward per head + interleaved dqkv writes + affine-grad accum.
    gq = ln_ref[0:1, :]
    gk = ln_ref[2:3, :]
    dg_q = jnp.zeros((1, d), jnp.float32)
    db_q = jnp.zeros((1, d), jnp.float32)
    dg_k = jnp.zeros((1, d), jnp.float32)
    db_k = jnp.zeros((1, d), jnp.float32)
    for hd in range(heads):
        base = hd * 3 * d
        dy_q = dq_s[hd]  # (h, w, d) f32 — grad wrt post-affine LN output
        dy_k = dk_s[hd]
        qhat = qhat_s[hd]
        khat = khat_s[hd]
        dg_q += jnp.sum(dy_q * qhat, axis=(0, 1)).reshape(1, d)
        db_q += jnp.sum(dy_q, axis=(0, 1)).reshape(1, d)
        dg_k += jnp.sum(dy_k * khat, axis=(0, 1)).reshape(1, d)
        db_k += jnp.sum(dy_k, axis=(0, 1)).reshape(1, d)
        dyg = dy_q * gq
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * qhat, axis=-1, keepdims=True)
        dq_raw = jnp.expand_dims(qinv_s[hd], -1) * (dyg - m1 - qhat * m2)
        dqkv_ref[0, :, :, base : base + d] = dq_raw.astype(dqkv_ref.dtype)
        dyg = dy_k * gk
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * khat, axis=-1, keepdims=True)
        dk_raw = jnp.expand_dims(kinv_s[hd], -1) * (dyg - m1 - khat * m2)
        dqkv_ref[0, :, :, base + d : base + 2 * d] = dk_raw.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, :, base + 2 * d : base + 3 * d] = dv_s[hd].astype(
            dqkv_ref.dtype
        )
    dln_ref[0:1, :] += dg_q
    dln_ref[1:2, :] += db_q
    dln_ref[2:3, :] += dg_k
    dln_ref[3:4, :] += db_k

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        for hd in range(heads):
            acc = jnp.zeros((w, w), jnp.float32)
            for g in range(gr):
                base = (hd * gr + g) * w
                acc = acc + dbr_s[base : base + w, base : base + w]
            dbx_ref[hd] = acc
        rmat = r_ref[...]
        m = h * wc
        for hd in range(heads):
            base = hd * m
            blk = dbc_s[base : base + m, base : base + m]
            dby_ref[hd] = jnp.dot(
                jnp.dot(rmat.T, blk, preferred_element_type=jnp.float32,
                        precision=_HIGH),
                rmat,
                preferred_element_type=jnp.float32,
                precision=_HIGH,
            )


@functools.lru_cache(maxsize=None)
def _make_fused_block(
    bt: int, h: int, w: int, heads: int, d: int, gr: int, wc: int,
    dtype_name: str, interpret: bool,
):
    dtype = jnp.dtype(dtype_name)
    c = heads * d
    nr, nc = heads * gr * w, heads * h * wc
    grid = (bt,)

    qkv_spec = pl.BlockSpec(
        (1, h, w, 3 * c), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (1, h, w, c), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    ln_spec = pl.BlockSpec((4, d), lambda b: (0, 0), memory_space=pltpu.VMEM)
    bx_spec = pl.BlockSpec((heads, w, w), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
    by_spec = pl.BlockSpec((heads, h, h), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((h * wc, h), lambda b: (0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((heads, 2), lambda b: (0, 0), memory_space=pltpu.SMEM)

    # Plain numpy (NOT jnp): this factory is lru_cached, and a jnp constant
    # built while a trace (e.g. nn.remat) is active would cache a tracer and
    # leak it into later traces.  Numpy operands are converted per-trace.
    rmat = np.kron(np.eye(h, dtype=np.float32), np.ones((wc, 1), np.float32))

    kdims = dict(h=h, w=w, heads=heads, d=d, gr=gr, wc=wc)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)
    head_scratch = lambda dt: pltpu.VMEM((heads, h, w, d), dt)
    inv_scratch = pltpu.VMEM((heads, h, w), jnp.float32)
    bias_scratch = [pltpu.VMEM((nr, nr), jnp.float32), pltpu.VMEM((nc, nc), jnp.float32)]

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **kdims),
        grid=grid,
        in_specs=[scale_spec, qkv_spec, ln_spec, bx_spec, by_spec, r_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((bt, h, w, c), dtype),
        scratch_shapes=[head_scratch(dtype)] * 3 + [head_scratch(jnp.float32)]
        + bias_scratch,
        compiler_params=cparams,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, **kdims),
        grid=grid,
        in_specs=[scale_spec, qkv_spec, ln_spec, bx_spec, by_spec, r_spec, o_spec],
        out_specs=[
            qkv_spec,
            pl.BlockSpec((4, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
            bx_spec, by_spec,
            pl.BlockSpec((2, heads), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, h, w, 3 * c), dtype),
            jax.ShapeDtypeStruct((4, d), jnp.float32),
            jax.ShapeDtypeStruct((heads, w, w), jnp.float32),
            jax.ShapeDtypeStruct((heads, h, h), jnp.float32),
            jax.ShapeDtypeStruct((2, heads), jnp.float32),
        ],
        scratch_shapes=[head_scratch(dtype)] * 4
        + [head_scratch(jnp.float32)] * 3
        + [head_scratch(jnp.float32)] * 2
        + [inv_scratch] * 2
        + bias_scratch + bias_scratch,
        compiler_params=cparams,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(qkv, ln, bx, by, scale):
        return fwd_call(scale, qkv, ln, bx, by, rmat)

    def fused_fwd(qkv, ln, bx, by, scale):
        return fwd_call(scale, qkv, ln, bx, by, rmat), (qkv, ln, bx, by, scale)

    def fused_bwd(res, do):
        qkv, ln, bx, by, scale = res
        dqkv, dln, dbx, dby, dscale = bwd_call(scale, qkv, ln, bx, by, rmat, do)
        return dqkv, dln, dbx, dby, dscale.T

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_block_attention(
    qkv: jax.Array,
    qn_scale: jax.Array,
    qn_bias: jax.Array,
    kn_scale: jax.Array,
    kn_bias: jax.Array,
    bias_x: jax.Array | None = None,
    bias_y: jax.Array | None = None,
    scale_x: jax.Array | None = None,
    scale_y: jax.Array | None = None,
    heads: int | None = None,
    chunk_target: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Axial attention + qk-LayerNorm over the raw QKV projection output.

    ``qkv``: ``(BT, H, W, heads*3*d)`` with per-head ``[q|k|v]`` interleave
    (exactly the Dense(3C) output under the ``(…, heads, 3d)`` reshape
    convention).  Numerically equal to LayerNorm(q)/LayerNorm(k) followed by
    :func:`fused_axial_attention_packed`.  Returns ``(BT, H, W, heads, d)``.
    """
    bt, h, w, c3 = qkv.shape
    if heads is None:
        raise ValueError("heads must be given (3C alone does not determine it)")
    d = c3 // (3 * heads)
    if chunk_target is None:
        import os

        chunk_target = int(os.environ.get("BUBBLEFORMER_FUSED_CHUNK", "64"))
    gr = _chunk_windows(h, w, chunk_target)
    wc = _chunk_windows(w, h, chunk_target)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    ln = jnp.stack(
        [
            qn_scale.astype(jnp.float32),
            qn_bias.astype(jnp.float32),
            kn_scale.astype(jnp.float32),
            kn_bias.astype(jnp.float32),
        ]
    )
    bx = (
        jnp.zeros((heads, w, w), jnp.float32)
        if bias_x is None
        else bias_x.astype(jnp.float32)
    )
    by = (
        jnp.zeros((heads, h, h), jnp.float32)
        if bias_y is None
        else bias_y.astype(jnp.float32)
    )
    ones = jnp.ones((heads,), jnp.float32)
    scale = jnp.stack(
        [
            (scale_x if scale_x is not None else ones).astype(jnp.float32),
            (scale_y if scale_y is not None else ones).astype(jnp.float32),
        ],
        axis=1,
    )

    fused = _make_fused_block(
        bt, h, w, heads, d, gr, wc, str(qkv.dtype), bool(interpret)
    )
    out = fused(qkv, ln, bx, by, scale)
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_attn")
    return out.reshape(bt, h, w, heads, d)

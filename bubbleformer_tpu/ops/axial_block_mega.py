"""Pallas TPU kernel v4: the whole axial-attention branch as one megakernel.

v3 (``ops/axial_fused_block.py``) moved the kernel boundary to the raw QKV
projection output and erased the XLA boundary-materialization penalty, but
the branch around it still runs as separate XLA ops per block: InstanceNorm1,
the QKV Dense matmul, InstanceNorm2 and the output Dense each cost a fixed
~0.1 ms dispatch on this op-count-bound device (DESIGN.md "Round-2 lesson")
plus an HBM round-trip of the (BT, H, W, 3C) qkv tensor.  This kernel folds
the **entire attention branch** of the reference block
(``bubbleformer/layers/attention.py:199-319``: norm1 -> 1x1-conv QKV ->
qk-LayerNorm -> axial attention -> norm2 -> 1x1-conv out) into a single
``pallas_call`` per direction:

* the only HBM tensors crossing the boundary are the block input ``x`` and
  the branch output — 3x less boundary traffic than v3's qkv tensor;
* both InstanceNorms compute their per-(sample, channel) spatial statistics
  in f32 in VMEM (single-pass ``E[x^2]-E[x]^2`` form, exactly
  ``layers/norm.py`` semantics);
* the QKV and output projections are per-image ``(H*W, C) @ (C, 3C)`` /
  ``(C, C)`` MXU matmuls on VMEM-resident operands;
* the backward pass is fully hand-written: it recomputes the forward chain
  flash-style and emits gradients for ``x`` and every parameter, with the
  weight gradients (``dW_qkv``, ``dW_out``, affine/LN/bias/scale grads)
  accumulated in VMEM across the sequential TPU grid (zeroed at the first
  grid step, reduced tables written at the last — the accumulation pattern
  v2/v3 established for the packed bias tables).

Attention math (head packing, in-kernel bias construction, window-mean
attn_scale treatment, chunk backward) is shared with v2/v3 via the helpers in
``ops/axial_fused_packed.py``.  Selectable as ``attn_impl='mega'``; parameter
paths (``norm1/{scale,bias}``, ``input_head/{kernel,bias}``,
``qnorm/{scale,bias}``, ``knorm/{scale,bias}``, ``norm2/{scale,bias}``,
``output_head/{kernel,bias}``) match the XLA impls, so checkpoints are
interchangeable across implementations.
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

_IN_EPS = 1e-5
_LN_EPS = 1e-5


def _instance_norm_fwd(xf, aff_ref):
    """Single-pass InstanceNorm over axis 0 of (N, C) f32; returns (y, xhat,
    inv) with ``y = xhat * scale + bias`` (layers/norm.py semantics)."""
    mu = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=0, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + _IN_EPS)
    xhat = (xf - mu) * inv
    return xhat * aff_ref[0:1, :] + aff_ref[1:2, :], xhat, inv


def _instance_norm_bwd(dy, xhat, inv, aff_ref):
    """dx for InstanceNorm given upstream dy (N, C) f32; (dscale, dbias) rows
    are accumulated by the caller."""
    dg = dy * aff_ref[0:1, :]
    m1 = jnp.mean(dg, axis=0, keepdims=True)
    m2 = jnp.mean(dg * xhat, axis=0, keepdims=True)
    return inv * (dg - m1 - xhat * m2)


def _ln_stats(x32):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return (x32 - mu) * inv, inv


def _stage_ln_scratch(qkv_s, ln_ref, q_s, k_s, v_s, qhat_s, khat_s, qinv_s,
                      kinv_s, heads, d):
    """Per-head q/k/v staging from the (H, W, 3C) qkv scratch with in-kernel
    qk-LayerNorm (v3 pattern, but sourced from VMEM scratch)."""
    for hd in range(heads):
        base = hd * 3 * d
        q_raw = qkv_s[:, :, base : base + d].astype(jnp.float32)
        k_raw = qkv_s[:, :, base + d : base + 2 * d].astype(jnp.float32)
        qhat, qinv = _ln_stats(q_raw)
        khat, kinv = _ln_stats(k_raw)
        q_s[hd] = (qhat * ln_ref[0:1, :] + ln_ref[1:2, :]).astype(q_s.dtype)
        k_s[hd] = (khat * ln_ref[2:3, :] + ln_ref[3:4, :]).astype(k_s.dtype)
        v_s[hd] = qkv_s[:, :, base + 2 * d : base + 3 * d].astype(v_s.dtype)
        if qhat_s is not None:
            qhat_s[hd] = qhat
            khat_s[hd] = khat
            qinv_s[hd] = qinv[:, :, 0]
            kinv_s[hd] = kinv[:, :, 0]


def _attn_chunks_fwd(q_s, k_s, v_s, o_s, br_s, bc_s, sx_col, sy_col,
                     h, w, heads, d, gr, wc):
    """Row + column packed attention chunks into o_s (0.5-averaged)."""
    scaling = d**-0.5
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
        o_s[:, sl] = (0.5 * o).reshape(heads, gr, w, d)

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
        o_s[:, :, sl] += (0.5 * o).reshape(heads, h, wc, d)


def _fwd_kernel(
    scale_ref, x_ref, in1_ref, wqkv_ref, bqkv_ref, ln_ref, in2_ref,
    wout_ref, bout_ref, bx_ref, by_ref, r_ref, o_ref, ao_ref,
    qkv_s, q_s, k_s, v_s, o_s, ao_s, br_s, bc_s,
    *, h, w, heads, d, gr, wc,
):
    b = pl.program_id(0)
    c = heads * d
    n = h * w

    @pl.when(b == 0)
    def _():
        _build_row_bias(br_s, bx_ref, heads, gr, w)
        _build_col_bias(bc_s, by_ref, r_ref, heads, h, wc)

    # InstanceNorm1 + QKV projection.
    xf = x_ref[0].reshape(n, c).astype(jnp.float32)
    xn, _, _ = _instance_norm_fwd(xf, in1_ref)
    xn = xn.astype(q_s.dtype)
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv_s[...] = (qkv + bqkv_ref[...]).astype(qkv_s.dtype).reshape(h, w, 3 * c)

    _stage_ln_scratch(qkv_s, ln_ref, q_s, k_s, v_s, None, None, None, None,
                      heads, d)
    sx_col = _smem_scale_col(scale_ref, heads, 0, gr * w)
    sy_col = _smem_scale_col(scale_ref, heads, 1, h * wc)
    _attn_chunks_fwd(q_s, k_s, v_s, o_s, br_s, bc_s, sx_col, sy_col,
                     h, w, heads, d, gr, wc)

    # InstanceNorm2 + output projection, all in VMEM.  The attention output
    # ``ao`` is also written out as a residual for the backward pass, which
    # then skips the forward chunk recompute entirely (one extra HBM tensor
    # vs 2x the chunk code + compute in the bwd kernel).
    for hd in range(heads):
        ao_s[:, hd * d : (hd + 1) * d] = o_s[hd].reshape(n, d)
    ao = ao_s[...]
    ao_ref[0] = ao.astype(ao_ref.dtype).reshape(h, w, c)
    y2, _, _ = _instance_norm_fwd(ao, in2_ref)
    y2 = y2.astype(q_s.dtype)
    out = jax.lax.dot_general(
        y2, wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + bout_ref[...]
    o_ref[0] = out.astype(o_ref.dtype).reshape(h, w, c)


def _bwd_kernel(
    scale_ref, x_ref, in1_ref, wqkv_ref, bqkv_ref, ln_ref, in2_ref,
    wout_ref, bout_ref, bx_ref, by_ref, r_ref, ao_ref, do_ref,
    dx_ref, din1_ref, dwqkv_ref, dbqkv_ref, dln_ref, din2_ref,
    dwout_ref, dbout_ref, dbx_ref, dby_ref, dscale_ref,
    qkv_s, q_s, k_s, v_s, ao_s, do_s, dq_s, dk_s, dv_s, dqkv_s,
    qhat_s, khat_s, qinv_s, kinv_s, br_s, bc_s, dbr_s, dbc_s,
    *, h, w, heads, d, gr, wc,
):
    b = pl.program_id(0)
    c = heads * d
    n = h * w
    nr, nc = heads * gr * w, heads * h * wc

    @pl.when(b == 0)
    def _():
        _build_row_bias(br_s, bx_ref, heads, gr, w)
        _build_col_bias(bc_s, by_ref, r_ref, heads, h, wc)
        dbr_s[...] = jnp.zeros((nr, nr), jnp.float32)
        dbc_s[...] = jnp.zeros((nc, nc), jnp.float32)
        din1_ref[...] = jnp.zeros_like(din1_ref[...])
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref[...])
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref[...])
        dln_ref[...] = jnp.zeros_like(dln_ref[...])
        din2_ref[...] = jnp.zeros_like(din2_ref[...])
        dwout_ref[...] = jnp.zeros_like(dwout_ref[...])
        dbout_ref[...] = jnp.zeros_like(dbout_ref[...])
        dscale_ref[...] = jnp.zeros_like(dscale_ref[...])

    # ---- Recompute the pre-attention chain (flash-style); the attention
    # output itself is a saved forward residual (ao_ref) ----
    xf = x_ref[0].reshape(n, c).astype(jnp.float32)
    xn32, xhat1, inv1 = _instance_norm_fwd(xf, in1_ref)
    xn = xn32.astype(q_s.dtype)
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv_s[...] = (qkv + bqkv_ref[...]).astype(qkv_s.dtype).reshape(h, w, 3 * c)
    _stage_ln_scratch(qkv_s, ln_ref, q_s, k_s, v_s, qhat_s, khat_s, qinv_s,
                      kinv_s, heads, d)
    sx_col = _smem_scale_col(scale_ref, heads, 0, gr * w)
    sy_col = _smem_scale_col(scale_ref, heads, 1, h * wc)
    ao = ao_ref[0].reshape(n, c).astype(jnp.float32)
    mu2 = jnp.mean(ao, axis=0, keepdims=True)
    var2 = jnp.maximum(jnp.mean(ao * ao, axis=0, keepdims=True) - mu2 * mu2, 0.0)
    inv2 = jax.lax.rsqrt(var2 + _IN_EPS)
    xhat2 = (ao - mu2) * inv2
    y2 = (xhat2 * in2_ref[0:1, :] + in2_ref[1:2, :]).astype(q_s.dtype)

    # ---- Output Dense backward ----
    do2 = do_ref[0].reshape(n, c)
    dwout_ref[...] += jax.lax.dot_general(
        y2, do2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbout_ref[...] += jnp.sum(do2.astype(jnp.float32), axis=0, keepdims=True)
    dy2 = jax.lax.dot_general(
        do2, wout_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # ---- InstanceNorm2 backward ----
    din2_ref[0:1, :] += jnp.sum(dy2 * xhat2, axis=0, keepdims=True)
    din2_ref[1:2, :] += jnp.sum(dy2, axis=0, keepdims=True)
    dao = _instance_norm_bwd(dy2, xhat2, inv2, in2_ref)

    # ---- Attention backward (head-packed chunks, v2/v3 machinery) ----
    # ao_s is dead after xhat2/dao are computed; reuse it to stage dao so the
    # per-head reads below are strided ref slices (proven to lower in Mosaic).
    ao_s[...] = dao
    for hd in range(heads):
        do_s[hd] = ao_s[:, hd * d : (hd + 1) * d].reshape(h, w, d).astype(
            do_s.dtype
        )

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

    # ---- qk-LayerNorm backward -> interleaved dqkv scratch ----
    gq = ln_ref[0:1, :]
    gk = ln_ref[2:3, :]
    dg_q = jnp.zeros((1, d), jnp.float32)
    db_q = jnp.zeros((1, d), jnp.float32)
    dg_k = jnp.zeros((1, d), jnp.float32)
    db_k = jnp.zeros((1, d), jnp.float32)
    for hd in range(heads):
        base = hd * 3 * d
        dy_q = dq_s[hd]
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
        dqkv_s[:, :, base : base + d] = dq_raw.astype(dqkv_s.dtype)
        dyg = dy_k * gk
        m1 = jnp.mean(dyg, axis=-1, keepdims=True)
        m2 = jnp.mean(dyg * khat, axis=-1, keepdims=True)
        dk_raw = jnp.expand_dims(kinv_s[hd], -1) * (dyg - m1 - khat * m2)
        dqkv_s[:, :, base + d : base + 2 * d] = dk_raw.astype(dqkv_s.dtype)
        dqkv_s[:, :, base + 2 * d : base + 3 * d] = dv_s[hd].astype(
            dqkv_s.dtype
        )
    dln_ref[0:1, :] += dg_q
    dln_ref[1:2, :] += db_q
    dln_ref[2:3, :] += dg_k
    dln_ref[3:4, :] += db_k

    # ---- QKV Dense backward ----
    dqkv2 = dqkv_s[...].reshape(n, 3 * c)
    dwqkv_ref[...] += jax.lax.dot_general(
        xn, dqkv2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbqkv_ref[...] += jnp.sum(dqkv2.astype(jnp.float32), axis=0, keepdims=True)
    dxn = jax.lax.dot_general(
        dqkv2, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # ---- InstanceNorm1 backward -> dx ----
    din1_ref[0:1, :] += jnp.sum(dxn * xhat1, axis=0, keepdims=True)
    din1_ref[1:2, :] += jnp.sum(dxn, axis=0, keepdims=True)
    dx = _instance_norm_bwd(dxn, xhat1, inv1, in1_ref)
    dx_ref[0] = dx.astype(dx_ref.dtype).reshape(h, w, c)

    # ---- Reduce packed-bias gradients to per-head tables once ----
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
def _make_mega_block(
    bt: int, h: int, w: int, heads: int, d: int, gr: int, wc: int,
    dtype_name: str, interpret: bool,
):
    dtype = jnp.dtype(dtype_name)
    c = heads * d
    n = h * w
    nr, nc = heads * gr * w, heads * h * wc
    grid = (bt,)

    x_spec = pl.BlockSpec(
        (1, h, w, c), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, (lambda b: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    in_aff_spec = const((2, c))
    wqkv_spec = const((c, 3 * c))
    bqkv_spec = const((1, 3 * c))
    ln_spec = const((4, d))
    wout_spec = const((c, c))
    bout_spec = const((1, c))
    bx_spec = const((heads, w, w))
    by_spec = const((heads, h, h))
    r_spec = const((h * wc, h))
    scale_spec = pl.BlockSpec((heads, 2), lambda b: (0, 0), memory_space=pltpu.SMEM)

    # Plain numpy (NOT jnp): this factory is lru_cached, and a jnp constant
    # built while a trace (e.g. nn.remat) is active would cache a tracer and
    # leak it into later traces.  Numpy operands are converted per-trace.
    rmat = np.kron(np.eye(h, dtype=np.float32), np.ones((wc, 1), np.float32))

    kdims = dict(h=h, w=w, heads=heads, d=d, gr=gr, wc=wc)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)
    head_scratch = lambda dt: pltpu.VMEM((heads, h, w, d), dt)
    inv_scratch = pltpu.VMEM((heads, h, w), jnp.float32)
    qkv_scratch = pltpu.VMEM((h, w, 3 * c), dtype)
    ao_scratch = pltpu.VMEM((n, c), jnp.float32)
    bias_scratch = [pltpu.VMEM((nr, nr), jnp.float32), pltpu.VMEM((nc, nc), jnp.float32)]

    in_specs = [
        scale_spec, x_spec, in_aff_spec, wqkv_spec, bqkv_spec, ln_spec,
        in_aff_spec, wout_spec, bout_spec, bx_spec, by_spec, r_spec,
    ]

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **kdims),
        grid=grid,
        in_specs=in_specs,
        out_specs=[x_spec, x_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
        ],
        scratch_shapes=[qkv_scratch] + [head_scratch(dtype)] * 3
        + [head_scratch(jnp.float32)] + [ao_scratch] + bias_scratch,
        compiler_params=cparams,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, **kdims),
        grid=grid,
        in_specs=in_specs + [x_spec, x_spec],
        out_specs=[
            x_spec, const((2, c)), const((c, 3 * c)), const((1, 3 * c)),
            const((4, d)), const((2, c)), const((c, c)), const((1, c)),
            bx_spec, by_spec,
            pl.BlockSpec((2, heads), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((4, d), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((heads, w, w), jnp.float32),
            jax.ShapeDtypeStruct((heads, h, h), jnp.float32),
            jax.ShapeDtypeStruct((2, heads), jnp.float32),
        ],
        scratch_shapes=[qkv_scratch] + [head_scratch(dtype)] * 3
        + [ao_scratch] + [head_scratch(dtype)]
        + [head_scratch(jnp.float32)] * 3 + [pltpu.VMEM((h, w, 3 * c), dtype)]
        + [head_scratch(jnp.float32)] * 2 + [inv_scratch] * 2
        + bias_scratch + bias_scratch,
        compiler_params=cparams,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(x, in1, wqkv, bqkv, ln, in2, wout, bout, bx, by, scale):
        out, _ = fwd_call(scale, x, in1, wqkv, bqkv, ln, in2, wout, bout, bx,
                          by, rmat)
        return out

    def fused_fwd(x, in1, wqkv, bqkv, ln, in2, wout, bout, bx, by, scale):
        out, ao = fwd_call(scale, x, in1, wqkv, bqkv, ln, in2, wout, bout, bx,
                           by, rmat)
        return out, (x, in1, wqkv, bqkv, ln, in2, wout, bout, bx, by, scale,
                     ao)

    def fused_bwd(res, do):
        (x, in1, wqkv, bqkv, ln, in2, wout, bout, bx, by, scale, ao) = res
        (dx, din1, dwqkv, dbqkv, dln, din2, dwout, dbout, dbx, dby,
         dscale) = bwd_call(scale, x, in1, wqkv, bqkv, ln, in2, wout, bout,
                            bx, by, rmat, ao, do)
        return (dx, din1, dwqkv, dbqkv, dln, din2, dwout, dbout, dbx, dby,
                dscale.T)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def mega_axial_block(
    x: jax.Array,
    in1_scale: jax.Array,
    in1_bias: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    qn_scale: jax.Array,
    qn_bias: jax.Array,
    kn_scale: jax.Array,
    kn_bias: jax.Array,
    in2_scale: jax.Array,
    in2_bias: jax.Array,
    wout: jax.Array,
    bout: jax.Array,
    bias_x: jax.Array | None = None,
    bias_y: jax.Array | None = None,
    scale_x: jax.Array | None = None,
    scale_y: jax.Array | None = None,
    heads: int | None = None,
    chunk_target: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Whole axial-attention branch in one kernel launch.

    ``x``: ``(BT, H, W, C)`` block input (pre-norm residual stream).  Returns
    the branch output after the output Dense — numerically equal to
    ``Dense(IN2(axial_attn(qkLN(split(Dense(IN1(x)))))))`` with flax/torch
    semantics for every stage (reference chain
    ``bubbleformer/layers/attention.py:199-319``).
    """
    bt, h, w, c = x.shape
    if heads is None:
        raise ValueError("heads must be given")
    d = c // heads
    if chunk_target is None:
        import os

        chunk_target = int(os.environ.get("BUBBLEFORMER_FUSED_CHUNK", "64"))
    gr = _chunk_windows(h, w, chunk_target)
    wc = _chunk_windows(w, h, chunk_target)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    f32 = jnp.float32
    in1 = jnp.stack([in1_scale.astype(f32), in1_bias.astype(f32)])
    in2 = jnp.stack([in2_scale.astype(f32), in2_bias.astype(f32)])
    ln = jnp.stack(
        [
            qn_scale.astype(f32),
            qn_bias.astype(f32),
            kn_scale.astype(f32),
            kn_bias.astype(f32),
        ]
    )
    bx = (
        jnp.zeros((heads, w, w), f32) if bias_x is None else bias_x.astype(f32)
    )
    by = (
        jnp.zeros((heads, h, h), f32) if bias_y is None else bias_y.astype(f32)
    )
    ones = jnp.ones((heads,), f32)
    scale = jnp.stack(
        [
            (scale_x if scale_x is not None else ones).astype(f32),
            (scale_y if scale_y is not None else ones).astype(f32),
        ],
        axis=1,
    )

    fused = _make_mega_block(
        bt, h, w, heads, d, gr, wc, str(x.dtype), bool(interpret)
    )
    out = fused(
        x,
        in1,
        wqkv.astype(x.dtype),
        bqkv.astype(f32).reshape(1, 3 * c),
        ln,
        in2,
        wout.astype(x.dtype),
        bout.astype(f32).reshape(1, c),
        bx,
        by,
        scale,
    )
    return jax.ad_checkpoint.checkpoint_name(out, "flash_attn")

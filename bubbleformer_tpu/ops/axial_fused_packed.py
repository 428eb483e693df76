"""Pallas TPU kernel v2: head-packed fused row+column axial attention.

The v1 fused kernel (``ops/axial_fused.py``) removed all XLA-side relayouts
but measured latency-bound: its inner loop issues heads x chunks small
``(gw, d) @ (d, gw)`` matmuls *serially* (96 MXU issue slots per image at the
flagship shape), and a chunk-size sweep was flat — fixed per-issue latency
dominates, not FLOPs (DESIGN.md "Known headroom").  This kernel attacks that
directly, following the reference's one-fused-SDPA-call hot loop
(``bubbleformer/layers/attention.py:105-117``) but with TPU packing:

* **Heads are packed block-diagonally into the sequence axis.**  A row chunk
  is one ``(heads*gr*W, d) @ (d, heads*gr*W)`` matmul whose logits carry ALL
  heads; a packed additive bias (per-head T5 table on the diagonal blocks,
  -1e9 off them) keeps heads and windows independent.  heads x fewer MXU
  issues at a heads-fold logit-FLOP waste that is irrelevant (true FLOPs are
  ~0.5% of one issue's roofline).
* **The attn_scale "uniform" component never becomes a matmul.**
  ``out = s*(P@V) + (1-s)*seg@V`` where ``seg@V`` is the within-window mean
  of V — computed as a reshape-mean-broadcast, so the seg matrices of v1
  (and their VMEM) disappear.  Same trick in the backward pass:
  ``seg^T @ X`` terms are window means, and ``sum(dP_eff * seg)`` reductions
  use the within-window mask recovered from the packed bias (``>= -1e8``).
* Per-head slices are staged once per image into ``(heads, H, W, d)``
  scratch (native dtype, upcast inside the matmul), not once per head per
  chunk; outputs accumulate in scratch and interleave back to ``(H, W, C)``
  once.

Layout contract is identical to v1 (``(BT, H, W, heads*d)`` blocks, heads as
channel slices), so it is a drop-in alternative behind
``fused_axial_attention(..., pack_heads=True)``.
"""
from __future__ import annotations

import functools

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bubbleformer_tpu.ops.axial_fused import (
    _chunk_windows,
    pack_col_bias,
    pack_row_bias,
)


def pack_heads_block_diag(per_head: jax.Array) -> jax.Array:
    """(heads, m, m) per-head packed bias -> (heads*m, heads*m) block-diag
    with -1e9 off the per-head diagonal blocks.  Differentiable (the VJP
    scatters the packed gradient back to the per-head tables)."""
    heads, m, _ = per_head.shape
    eye = jnp.eye(heads, dtype=per_head.dtype)
    # kron(eye, .) with per-head blocks: expand to (heads, m, heads, m).
    full = eye[:, None, :, None] * jnp.ones((1, m, 1, m), per_head.dtype)
    blocks = jnp.where(
        eye[:, None, :, None] > 0,
        per_head[:, :, None, :],
        0.0,
    )
    off = (1.0 - full) * (-1e9)
    return (blocks + off).reshape(heads * m, heads * m)


def _smem_scale_col(scale_ref, heads: int, col: int, rep: int) -> jax.Array:
    """Per-row scale column vector (heads*rep, 1) from the (heads, 2) SMEM.

    Built with iota + selects: the natural ``broadcast_to(...).reshape(n, 1)``
    is an unsupported shape cast in Mosaic's layout inference (verified on
    v5e), while 2D iota and lane-broadcast selects lower fine."""
    row_head = jax.lax.broadcasted_iota(jnp.int32, (heads * rep, 1), 0) // rep
    out = jnp.zeros((heads * rep, 1), jnp.float32)
    for hd in range(heads):
        out = jnp.where(row_head == hd, scale_ref[hd, col], out)
    return out


def _win_mean_rows(x: jax.Array, g: int, n: int, d: int) -> jax.Array:
    """(G*n, d) -> per-window mean broadcast back, rows packing (G, n)."""
    m = jnp.mean(x.reshape(g, n, d), axis=1, keepdims=True)
    return jnp.broadcast_to(m, (g, n, d)).reshape(g * n, d)


def _win_mean_cols(x: jax.Array, heads: int, h: int, wc: int, d: int) -> jax.Array:
    """(heads*h*wc, d) -> window mean over the row axis (strided windows)."""
    m = jnp.mean(x.reshape(heads, h, wc, d), axis=1, keepdims=True)
    return jnp.broadcast_to(m, (heads, h, wc, d)).reshape(heads * h * wc, d)


def _fwd_kernel(
    scale_ref, q_ref, k_ref, v_ref, br_ref, bc_ref, o_ref,
    q_s, k_s, v_s, o_s,
    *, h, w, heads, d, gr, wc,
):
    for hd in range(heads):
        ch = slice(hd * d, (hd + 1) * d)
        q_s[hd] = q_ref[0, :, :, ch]
        k_s[hd] = k_ref[0, :, :, ch]
        v_s[hd] = v_ref[0, :, :, ch]

    scaling = d**-0.5
    sx_col = _smem_scale_col(scale_ref, heads, 0, gr * w)
    sy_col = _smem_scale_col(scale_ref, heads, 1, h * wc)

    # Row chunks: all heads in one matmul per chunk.
    for ci in range(h // gr):
        sl = slice(ci * gr, (ci + 1) * gr)
        qc = q_s[:, sl].reshape(heads * gr * w, d)
        kc = k_s[:, sl].reshape(heads * gr * w, d)
        vc = v_s[:, sl].reshape(heads * gr * w, d)
        s_mat = jax.lax.dot_general(
            qc, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s_mat = s_mat * scaling + br_ref[...]
        p = jax.nn.softmax(s_mat, axis=-1)
        pv = jnp.dot(p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
        vm = _win_mean_rows(vc.astype(jnp.float32), heads * gr, w, d)
        o = sx_col * pv + (1.0 - sx_col) * vm
        o_s[:, sl] = (0.5 * o).reshape(heads, gr, w, d).astype(o_s.dtype)

    # Column chunks.
    for ci in range(w // wc):
        sl = slice(ci * wc, (ci + 1) * wc)
        qc = q_s[:, :, sl].reshape(heads * h * wc, d)
        kc = k_s[:, :, sl].reshape(heads * h * wc, d)
        vc = v_s[:, :, sl].reshape(heads * h * wc, d)
        s_mat = jax.lax.dot_general(
            qc, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s_mat = s_mat * scaling + bc_ref[...]
        p = jax.nn.softmax(s_mat, axis=-1)
        pv = jnp.dot(p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
        vm = _win_mean_cols(vc.astype(jnp.float32), heads, h, wc, d)
        o = sy_col * pv + (1.0 - sy_col) * vm
        o_s[:, :, sl] += (0.5 * o).reshape(heads, h, wc, d).astype(o_s.dtype)

    for hd in range(heads):
        ch = slice(hd * d, (hd + 1) * d)
        o_ref[0, :, :, ch] = o_s[hd].astype(o_ref.dtype)


def _bwd_chunk(qc, kc, vc, doc, bias, s_col, n_win, d, win_mean):
    """Recompute-and-differentiate one head-packed chunk.

    Returns dq, dk, dv, dbias(=ds_mat), per-row d(scale) values."""
    scaling = d**-0.5
    s_mat = jax.lax.dot_general(
        qc, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s_mat = s_mat * scaling + bias
    p = jax.nn.softmax(s_mat, axis=-1)
    mask = (bias >= -1e8).astype(jnp.float32)

    doc32 = doc.astype(jnp.float32)
    # dV = P_eff^T dO = P^T (s dO) + seg^T ((1-s) dO); seg^T X = window mean.
    dv = jax.lax.dot_general(
        p.astype(doc.dtype), (s_col * doc32).astype(doc.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dv = dv + win_mean((1.0 - s_col) * doc32)
    # dP_eff = dO V^T
    dp_eff = jax.lax.dot_general(
        doc, vc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # d(scale)[row] = sum_t dP_eff (P - seg); seg row-sums use the mask.
    seg_row = jnp.sum(dp_eff * mask, axis=-1, keepdims=True) / n_win
    ds_rows = jnp.sum(dp_eff * p, axis=-1, keepdims=True) - seg_row  # (N, 1)
    # Softmax backward on dP = s_col * dP_eff.
    dp = s_col * dp_eff
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds_mat = p * (dp - delta)
    dq = jnp.dot(ds_mat.astype(kc.dtype), kc, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds_mat.astype(qc.dtype), qc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dq * scaling, dk * scaling, dv, ds_mat, ds_rows


def _bwd_kernel(
    scale_ref, q_ref, k_ref, v_ref, br_ref, bc_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dbr_ref, dbc_ref, dscale_ref,
    q_s, k_s, v_s, do_s, dq_s, dk_s, dv_s,
    *, h, w, heads, d, gr, wc,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dbr_ref[...] = jnp.zeros_like(dbr_ref[...])
        dbc_ref[...] = jnp.zeros_like(dbc_ref[...])
        dscale_ref[...] = jnp.zeros_like(dscale_ref[...])

    for hd in range(heads):
        ch = slice(hd * d, (hd + 1) * d)
        q_s[hd] = q_ref[0, :, :, ch]
        k_s[hd] = k_ref[0, :, :, ch]
        v_s[hd] = v_ref[0, :, :, ch]
        do_s[hd] = do_ref[0, :, :, ch]

    sx_col = _smem_scale_col(scale_ref, heads, 0, gr * w)
    sy_col = _smem_scale_col(scale_ref, heads, 1, h * wc)

    dsx = jnp.zeros((heads * gr * w, 1), jnp.float32)
    for ci in range(h // gr):
        sl = slice(ci * gr, (ci + 1) * gr)
        shp = (heads, gr, w, d)
        dq, dk, dv, dsm, dsr = _bwd_chunk(
            q_s[:, sl].reshape(heads * gr * w, d),
            k_s[:, sl].reshape(heads * gr * w, d),
            v_s[:, sl].reshape(heads * gr * w, d),
            (do_s[:, sl].reshape(heads * gr * w, d).astype(jnp.float32) * 0.5
             ).astype(do_s.dtype),
            br_ref[...],
            sx_col,
            float(w),
            d,
            lambda x: _win_mean_rows(x, heads * gr, w, d),
        )
        dq_s[:, sl] = dq.reshape(shp).astype(dq_s.dtype)
        dk_s[:, sl] = dk.reshape(shp).astype(dk_s.dtype)
        dv_s[:, sl] = dv.reshape(shp).astype(dv_s.dtype)
        dbr_ref[...] += dsm
        dsx += dsr

    dsy = jnp.zeros((heads * h * wc, 1), jnp.float32)
    for ci in range(w // wc):
        sl = slice(ci * wc, (ci + 1) * wc)
        shp = (heads, h, wc, d)
        dq, dk, dv, dsm, dsr = _bwd_chunk(
            q_s[:, :, sl].reshape(heads * h * wc, d),
            k_s[:, :, sl].reshape(heads * h * wc, d),
            v_s[:, :, sl].reshape(heads * h * wc, d),
            (do_s[:, :, sl].reshape(heads * h * wc, d).astype(jnp.float32) * 0.5
             ).astype(do_s.dtype),
            bc_ref[...],
            sy_col,
            float(h),
            d,
            lambda x: _win_mean_cols(x, heads, h, wc, d),
        )
        dq_s[:, :, sl] += dq.reshape(shp).astype(dq_s.dtype)
        dk_s[:, :, sl] += dk.reshape(shp).astype(dk_s.dtype)
        dv_s[:, :, sl] += dv.reshape(shp).astype(dv_s.dtype)
        dbc_ref[...] += dsm
        dsy += dsr

    dscale_ref[0, :] += jnp.sum(dsx.reshape(heads, gr * w), axis=1)
    dscale_ref[1, :] += jnp.sum(dsy.reshape(heads, h * wc), axis=1)

    for hd in range(heads):
        ch = slice(hd * d, (hd + 1) * d)
        dq_ref[0, :, :, ch] = dq_s[hd].astype(dq_ref.dtype)
        dk_ref[0, :, :, ch] = dk_s[hd].astype(dk_ref.dtype)
        dv_ref[0, :, :, ch] = dv_s[hd].astype(dv_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_fused_packed(
    bt: int, h: int, w: int, heads: int, d: int, gr: int, wc: int,
    dtype_name: str, interpret: bool,
):
    dtype = jnp.dtype(dtype_name)
    c = heads * d
    nr, nc = heads * gr * w, heads * h * wc
    grid = (bt,)

    qkv_spec = pl.BlockSpec(
        (1, h, w, c), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    br_spec = pl.BlockSpec((nr, nr), lambda b: (0, 0), memory_space=pltpu.VMEM)
    bc_spec = pl.BlockSpec((nc, nc), lambda b: (0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((heads, 2), lambda b: (0, 0), memory_space=pltpu.SMEM)

    kdims = dict(h=h, w=w, heads=heads, d=d, gr=gr, wc=wc)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    head_scratch = lambda dt: pltpu.VMEM((heads, h, w, d), dt)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **kdims),
        grid=grid,
        in_specs=[scale_spec, qkv_spec, qkv_spec, qkv_spec, br_spec, bc_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bt, h, w, c), dtype),
        scratch_shapes=[head_scratch(dtype)] * 3 + [head_scratch(jnp.float32)],
        compiler_params=cparams,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, **kdims),
        grid=grid,
        in_specs=[
            scale_spec, qkv_spec, qkv_spec, qkv_spec, br_spec, bc_spec, qkv_spec,
        ],
        out_specs=[
            qkv_spec, qkv_spec, qkv_spec, br_spec, bc_spec,
            pl.BlockSpec((2, heads), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((nr, nr), jnp.float32),
            jax.ShapeDtypeStruct((nc, nc), jnp.float32),
            jax.ShapeDtypeStruct((2, heads), jnp.float32),
        ],
        scratch_shapes=[head_scratch(dtype)] * 4 + [head_scratch(jnp.float32)] * 3,
        compiler_params=cparams,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(q, k, v, br, bc, scale):
        return fwd_call(scale, q, k, v, br, bc)

    def fused_fwd(q, k, v, br, bc, scale):
        return fwd_call(scale, q, k, v, br, bc), (q, k, v, br, bc, scale)

    def fused_bwd(res, do):
        q, k, v, br, bc, scale = res
        dq, dk, dv, dbr, dbc, dscale = bwd_call(scale, q, k, v, br, bc, do)
        return dq, dk, dv, dbr, dbc, dscale.T

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_axial_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias_x: jax.Array | None = None,
    bias_y: jax.Array | None = None,
    scale_x: jax.Array | None = None,
    scale_y: jax.Array | None = None,
    chunk_target: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Head-packed fused axial attention; contract identical to
    :func:`bubbleformer_tpu.ops.axial_fused.fused_axial_attention`."""
    bt, h, w, heads, d = q.shape
    if chunk_target is None:
        import os

        chunk_target = int(os.environ.get("BUBBLEFORMER_FUSED_CHUNK", "64"))
    gr = _chunk_windows(h, w, chunk_target)
    wc = _chunk_windows(w, h, chunk_target)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    br = pack_heads_block_diag(pack_row_bias(bias_x, heads, gr, w))
    bc = pack_heads_block_diag(pack_col_bias(bias_y, heads, h, wc))
    ones = jnp.ones((heads,), jnp.float32)
    scale = jnp.stack(
        [
            (scale_x if scale_x is not None else ones).astype(jnp.float32),
            (scale_y if scale_y is not None else ones).astype(jnp.float32),
        ],
        axis=1,
    )

    common = jnp.promote_types(jnp.promote_types(q.dtype, k.dtype), v.dtype)
    fused = _make_fused_packed(
        bt, h, w, heads, d, gr, wc, str(common), bool(interpret)
    )
    c = heads * d
    out = fused(
        q.astype(common).reshape(bt, h, w, c),
        k.astype(common).reshape(bt, h, w, c),
        v.astype(common).reshape(bt, h, w, c),
        br, bc, scale,
    )
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_attn")
    return out.reshape(bt, h, w, heads, d)

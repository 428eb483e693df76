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
* **The packed bias tables are built inside the kernel**, once per call at
  grid cell 0, into VMEM scratch that persists across the (sequential) grid.
  Measured motivation: the isolated kernel costs fwd 1.9 + bwd 2.3 ms at the
  flagship shape, but an XLA-side kron/where packing of the (N, N) bias and
  its autodiff unpacking added ~3 ms/block — more than the kernel itself.
  Rows place the (W, W) table on window-diagonal blocks (plain block
  writes); columns need ``kron(bias_y, eye(wc))``, whose reshape does not
  lower in Mosaic — instead it is computed as ``R @ bias_y @ R^T`` with a
  constant 0/1 repeat matrix (exact gather via matmul, Precision.HIGHEST)
  under an iota stripe mask.  The backward reduces the packed-bias gradient
  back to the small (heads, n, n) tables in-kernel the same way (diagonal
  block sums for rows, ``R^T @ blk @ R`` for columns) at the last grid cell.
* **The attn_scale "uniform" component never becomes a matmul.**
  ``out = s*(P@V) + (1-s)*seg@V`` where ``seg@V`` is the within-window mean
  of V — computed as a reshape-mean-broadcast.  Same trick in the backward
  pass: ``seg^T @ X`` terms are window means, and ``sum(dP_eff * seg)``
  reductions use the within-window mask recovered from the packed bias
  (``>= -1e8``).
* Per-head slices are staged once per image into ``(heads, H, W, d)``
  scratch (native dtype, upcast inside the matmul), not once per head per
  chunk; outputs accumulate in scratch and interleave back to ``(H, W, C)``
  once.

Mosaic notes (verified on v5e): building the per-row scale column via
``broadcast_to(...).reshape(n, 1)`` is an unsupported shape cast — iota +
selects lower fine; ``(h, wc, h, wc) -> (h*wc, h*wc)`` reshapes and
``jnp.repeat`` do not lower — the matmul spread does.

Layout contract is identical to v1 (``(BT, H, W, heads*d)`` blocks, heads as
channel slices), so it is a drop-in alternative behind
``attn_impl='fused_packed'``.
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

_HIGH = jax.lax.Precision.HIGHEST


def pack_heads_block_diag(per_head: jax.Array) -> jax.Array:
    """(heads, m, m) per-head packed bias -> (heads*m, heads*m) block-diag
    with -1e9 off the per-head diagonal blocks.  XLA-side reference of the
    in-kernel construction (used by tests/probes)."""
    heads, m, _ = per_head.shape
    eye = jnp.eye(heads, dtype=per_head.dtype)
    full = eye[:, None, :, None] * jnp.ones((1, m, 1, m), per_head.dtype)
    blocks = jnp.where(
        eye[:, None, :, None] > 0,
        per_head[:, :, None, :],
        0.0,
    )
    off = (1.0 - full) * (-1e9)
    return (blocks + off).reshape(heads * m, heads * m)


def _smem_scale_col(scale_ref, heads: int, col: int, rep: int) -> jax.Array:
    """Per-row scale column vector (heads*rep, 1) from the (heads, 2) SMEM."""
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


def _build_row_bias(br_s, bx_ref, heads: int, gr: int, w: int) -> None:
    """Fill (heads*gr*w)^2 scratch: bx on (head, window) diagonal blocks."""
    nr = heads * gr * w
    br_s[...] = jnp.full((nr, nr), -1e9, jnp.float32)
    for hd in range(heads):
        for g in range(gr):
            base = (hd * gr + g) * w
            br_s[base : base + w, base : base + w] = bx_ref[hd]


def _build_col_bias(bc_s, by_ref, r_ref, heads: int, h: int, wc: int) -> None:
    """Fill (heads*h*wc)^2 scratch: kron(by, eye(wc)) per head-diagonal block
    via the matmul spread R @ by @ R^T under an iota stripe mask."""
    nc = heads * h * wc
    m = h * wc
    bc_s[...] = jnp.full((nc, nc), -1e9, jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    stripe = (ri % wc) == (ci % wc)
    rmat = r_ref[...]
    for hd in range(heads):
        base = hd * m
        spread = jnp.dot(
            jnp.dot(rmat, by_ref[hd], preferred_element_type=jnp.float32, precision=_HIGH),
            rmat.T,
            preferred_element_type=jnp.float32,
            precision=_HIGH,
        )
        bc_s[base : base + m, base : base + m] = jnp.where(stripe, spread, -1e9)


def _fwd_kernel(
    scale_ref, q_ref, k_ref, v_ref, bx_ref, by_ref, r_ref, o_ref,
    q_s, k_s, v_s, o_s, br_s, bc_s,
    *, h, w, heads, d, gr, wc,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        _build_row_bias(br_s, bx_ref, heads, gr, w)
        _build_col_bias(bc_s, by_ref, r_ref, heads, h, wc)

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
        s_mat = s_mat * scaling + br_s[...]
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
        s_mat = s_mat * scaling + bc_s[...]
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
    scale_ref, q_ref, k_ref, v_ref, bx_ref, by_ref, r_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dbx_ref, dby_ref, dscale_ref,
    q_s, k_s, v_s, do_s, dq_s, dk_s, dv_s, br_s, bc_s, dbr_s, dbc_s,
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

    for hd in range(heads):
        ch = slice(hd * d, (hd + 1) * d)
        q_s[hd] = q_ref[0, :, :, ch]
        k_s[hd] = k_ref[0, :, :, ch]
        v_s[hd] = v_ref[0, :, :, ch]
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

    for hd in range(heads):
        ch = slice(hd * d, (hd + 1) * d)
        dq_ref[0, :, :, ch] = dq_s[hd].astype(dq_ref.dtype)
        dk_ref[0, :, :, ch] = dk_s[hd].astype(dk_ref.dtype)
        dv_ref[0, :, :, ch] = dv_s[hd].astype(dv_ref.dtype)

    # Reduce the packed-bias gradients to the small per-head tables once.
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
                jnp.dot(rmat.T, blk, preferred_element_type=jnp.float32, precision=_HIGH),
                rmat,
                preferred_element_type=jnp.float32,
                precision=_HIGH,
            )


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
    bx_spec = pl.BlockSpec((heads, w, w), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
    by_spec = pl.BlockSpec((heads, h, h), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((h * wc, h), lambda b: (0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((heads, 2), lambda b: (0, 0), memory_space=pltpu.SMEM)

    # Constant 0/1 repeat matrix for the column kron spread.  Plain numpy
    # (NOT jnp): this factory is lru_cached, and a jnp constant built while
    # a trace (e.g. nn.remat) is active would cache a tracer and leak it
    # into later traces.  Numpy operands are converted per-trace.
    rmat = np.kron(np.eye(h, dtype=np.float32), np.ones((wc, 1), np.float32))

    kdims = dict(h=h, w=w, heads=heads, d=d, gr=gr, wc=wc)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    head_scratch = lambda dt: pltpu.VMEM((heads, h, w, d), dt)
    bias_scratch = [pltpu.VMEM((nr, nr), jnp.float32), pltpu.VMEM((nc, nc), jnp.float32)]

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **kdims),
        grid=grid,
        in_specs=[scale_spec, qkv_spec, qkv_spec, qkv_spec, bx_spec, by_spec, r_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bt, h, w, c), dtype),
        scratch_shapes=[head_scratch(dtype)] * 3 + [head_scratch(jnp.float32)]
        + bias_scratch,
        compiler_params=cparams,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, **kdims),
        grid=grid,
        in_specs=[
            scale_spec, qkv_spec, qkv_spec, qkv_spec, bx_spec, by_spec, r_spec,
            qkv_spec,
        ],
        out_specs=[
            qkv_spec, qkv_spec, qkv_spec, bx_spec, by_spec,
            pl.BlockSpec((2, heads), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((heads, w, w), jnp.float32),
            jax.ShapeDtypeStruct((heads, h, h), jnp.float32),
            jax.ShapeDtypeStruct((2, heads), jnp.float32),
        ],
        scratch_shapes=[head_scratch(dtype)] * 4 + [head_scratch(jnp.float32)] * 3
        + bias_scratch + bias_scratch,
        compiler_params=cparams,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(q, k, v, bx, by, scale):
        return fwd_call(scale, q, k, v, bx, by, rmat)

    def fused_fwd(q, k, v, bx, by, scale):
        return fwd_call(scale, q, k, v, bx, by, rmat), (q, k, v, bx, by, scale)

    def fused_bwd(res, do):
        q, k, v, bx, by, scale = res
        dq, dk, dv, dbx, dby, dscale = bwd_call(scale, q, k, v, bx, by, rmat, do)
        return dq, dk, dv, dbx, dby, dscale.T

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

    zeros_x = jnp.zeros((heads, w, w), jnp.float32)
    zeros_y = jnp.zeros((heads, h, h), jnp.float32)
    bx = zeros_x if bias_x is None else bias_x.astype(jnp.float32)
    by = zeros_y if bias_y is None else bias_y.astype(jnp.float32)
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
        bx, by, scale,
    )
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_attn")
    return out.reshape(bt, h, w, heads, d)

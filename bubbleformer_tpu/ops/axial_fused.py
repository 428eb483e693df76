"""Pallas TPU kernel: fused row+column axial attention, natural layout.

Replaces the round-1 ``axial_pallas`` kernel for the spatial axial block
(reference ``bubbleformer/layers/attention.py:199-319``). That kernel fixed
MXU occupancy by packing tiny sequences, but required XLA-side
transpose+reshape relayouts into a ``(heads, M, n, d)`` layout — measured to
*lose* to plain dot_general at the flagship 512^2/patch-16 shape (120.7 vs
92.3 ms for the 12-block axial stack, fwd+bwd). This kernel removes every
relayout:

* q/k/v arrive as ``(BT, H, W, C)`` — the exact layout the QKV projection
  produces — so the minor (lane-tiled) dims are the well-aligned ``(W, C)``;
  heads are channel slices taken inside the kernel. (A 5-D
  ``(..., heads, d)`` layout would put the misaligned ``(6, 64)`` pair in
  the tiled position — measured unlowerable/padded 5x by Mosaic.)
* **Row attention** packs G_r consecutive rows into one ``(G_r*W, d)`` matrix
  per MXU matmul — row windows are contiguous in the flattened token order,
  so packing is a reshape, not a copy. A block-diagonal additive bias
  (T5 table on the diagonal, -1e9 off it) keeps windows independent.
* **Column attention needs no transpose either**: a chunk of W_c consecutive
  columns ``(H, W_c, d)`` reshapes to ``(H*W_c, d)`` with token order
  ``p = i*W_c + c``; the packed bias ``kron(bias_y, eye(W_c))`` masks every
  pair with ``c_p != c_q``, which *is* column attention on row-major data.
* Both axes run in one kernel launch sharing the q/k/v loads; the averaged
  output ``(xx + xy) / 2`` is written once. The reference's attn_scale
  decomposition is fused algebraically (``P_eff = s*P + (1-s)*seg`` where
  ``seg`` is the per-window mean matrix — see ops/attention.py), so the
  packed logits never leave VMEM.

The custom VJP recomputes S/P per chunk flash-style and emits gradients for
q, k, v, both packed bias tables (reduced to the (n, n) T5 tables by autodiff
of the kron packing outside the kernel) and both per-head scale factors.
"""
from __future__ import annotations

import functools

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunk_windows(n_windows: int, win_len: int, target: int) -> int:
    """Windows per chunk: largest g <= target//win_len dividing n_windows."""
    g = max(1, min(n_windows, target // max(1, win_len)))
    while g > 1 and n_windows % g:
        g -= 1
    return g


def _off_diag_rows(g: int, n: int) -> np.ndarray:
    """-1e9 where two tokens of a (g*n) row-chunk are in different windows."""
    eye = np.kron(np.eye(g, dtype=np.float32), np.ones((n, n), np.float32))
    return (1.0 - eye) * -1e9


def _off_diag_cols(n: int, g: int) -> np.ndarray:
    """-1e9 where two tokens of an (n*g) column-chunk differ in column."""
    eye = np.kron(np.ones((n, n), np.float32), np.eye(g, dtype=np.float32))
    return (1.0 - eye) * -1e9


def _seg_rows(g: int, n: int) -> np.ndarray:
    """Within-window averaging matrix for row chunks (block diagonal 1/n)."""
    return np.kron(np.eye(g, dtype=np.float32), np.full((n, n), 1.0 / n, np.float32))


def _seg_cols(n: int, g: int) -> np.ndarray:
    """Within-window averaging matrix for column chunks (strided 1/n)."""
    return np.kron(np.full((n, n), 1.0 / n, np.float32), np.eye(g, dtype=np.float32))


def pack_row_bias(bias: jax.Array | None, heads: int, g: int, n: int) -> jax.Array:
    off = jnp.asarray(_off_diag_rows(g, n))
    if bias is None:
        return jnp.broadcast_to(off, (heads, g * n, g * n))
    packed = jnp.kron(jnp.eye(g, dtype=jnp.float32), bias.astype(jnp.float32))
    return packed + off


def pack_col_bias(bias: jax.Array | None, heads: int, n: int, g: int) -> jax.Array:
    off = jnp.asarray(_off_diag_cols(n, g))
    if bias is None:
        return jnp.broadcast_to(off, (heads, n * g, n * g))
    packed = jnp.kron(bias.astype(jnp.float32), jnp.eye(g, dtype=jnp.float32))
    return packed + off


def _attn_chunk(qc, kc, vc, bias, seg, sval, d):
    """One packed-masked attention chunk; all operands 2D in VMEM."""
    s_mat = jax.lax.dot_general(
        qc, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s_mat = s_mat * (d**-0.5) + bias
    p = jax.nn.softmax(s_mat, axis=-1)
    p_eff = sval * p + (1.0 - sval) * seg
    return jnp.dot(p_eff, vc, preferred_element_type=jnp.float32)


def _fwd_kernel(
    scale_ref, q_ref, k_ref, v_ref, br_ref, bc_ref, sr_ref, sc_ref, o_ref,
    q_s, k_s, v_s,
    *, h, w, heads, d, gr, wc,
):
    for hd in range(heads):
        ch = slice(hd * d, (hd + 1) * d)
        # Stage the head's planes through f32 scratch once — the 64-lane
        # channel slice is a cross-lane shuffle; chunk reads below then hit
        # plain aligned 3D refs instead of re-slicing per chunk.
        q_s[...] = q_ref[0, :, :, ch].astype(jnp.float32)
        k_s[...] = k_ref[0, :, :, ch].astype(jnp.float32)
        v_s[...] = v_ref[0, :, :, ch].astype(jnp.float32)
        sx = scale_ref[hd, 0]
        sy = scale_ref[hd, 1]

        # Row chunks tile axis 0 disjointly, column chunks tile axis 1; each
        # chunk result is written straight to its output slice (keeping the
        # kernel's live set to one chunk) and the two passes combine via one
        # read-modify-write — in-kernel scatter is not lowerable on TPU.
        for ci in range(h // gr):
            sl = slice(ci * gr, (ci + 1) * gr)
            o = _attn_chunk(
                q_s[sl].reshape(gr * w, d),
                k_s[sl].reshape(gr * w, d),
                v_s[sl].reshape(gr * w, d),
                br_ref[hd],
                sr_ref[...],
                sx,
                d,
            )
            o_ref[0, sl, :, ch] = (0.5 * o).reshape(gr, w, d).astype(o_ref.dtype)

        for ci in range(w // wc):
            sl = slice(ci * wc, (ci + 1) * wc)
            o = _attn_chunk(
                q_s[:, sl].reshape(h * wc, d),
                k_s[:, sl].reshape(h * wc, d),
                v_s[:, sl].reshape(h * wc, d),
                bc_ref[hd],
                sc_ref[...],
                sy,
                d,
            )
            o_ref[0, :, sl, ch] += (0.5 * o).reshape(h, wc, d).astype(o_ref.dtype)


def _bwd_chunk(qc, kc, vc, doc, bias, seg, sval, d):
    """Recompute-and-differentiate one chunk; returns dq, dk, dv, dbias, ds."""
    scaling = d**-0.5
    s_mat = jax.lax.dot_general(
        qc, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s_mat = s_mat * scaling + bias
    p = jax.nn.softmax(s_mat, axis=-1)

    p_eff = sval * p + (1.0 - sval) * seg
    # dV = P_eff^T @ dO
    dv = jax.lax.dot_general(
        p_eff, doc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dP_eff = dO @ V^T
    dp_eff = jax.lax.dot_general(
        doc, vc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds_scale = jnp.sum(dp_eff * (p - seg))
    dp = sval * dp_eff
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds_mat = p * (dp - delta)
    dq = jnp.dot(ds_mat, kc, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds_mat, qc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dq * scaling, dk * scaling, dv, ds_mat, ds_scale


def _bwd_kernel(
    scale_ref, q_ref, k_ref, v_ref, br_ref, bc_ref, sr_ref, sc_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dbr_ref, dbc_ref, dscale_ref,
    q_s, k_s, v_s, do_s,
    *, h, w, heads, d, gr, wc,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dbr_ref[...] = jnp.zeros_like(dbr_ref[...])
        dbc_ref[...] = jnp.zeros_like(dbc_ref[...])
        for hd in range(heads):
            dscale_ref[hd, 0] = 0.0
            dscale_ref[hd, 1] = 0.0

    for hd in range(heads):
        ch = slice(hd * d, (hd + 1) * d)
        q_s[...] = q_ref[0, :, :, ch].astype(jnp.float32)
        k_s[...] = k_ref[0, :, :, ch].astype(jnp.float32)
        v_s[...] = v_ref[0, :, :, ch].astype(jnp.float32)
        do_s[...] = do_ref[0, :, :, ch].astype(jnp.float32) * 0.5
        sx = scale_ref[hd, 0]
        sy = scale_ref[hd, 1]

        dsx = 0.0
        for ci in range(h // gr):
            sl = slice(ci * gr, (ci + 1) * gr)
            dq, dk, dv, dbias, ds = _bwd_chunk(
                q_s[sl].reshape(gr * w, d),
                k_s[sl].reshape(gr * w, d),
                v_s[sl].reshape(gr * w, d),
                do_s[sl].reshape(gr * w, d),
                br_ref[hd],
                sr_ref[...],
                sx,
                d,
            )
            dq_ref[0, sl, :, ch] = dq.reshape(gr, w, d).astype(dq_ref.dtype)
            dk_ref[0, sl, :, ch] = dk.reshape(gr, w, d).astype(dk_ref.dtype)
            dv_ref[0, sl, :, ch] = dv.reshape(gr, w, d).astype(dv_ref.dtype)
            dbr_ref[hd] += dbias
            dsx += ds
        dscale_ref[hd, 0] += dsx

        dsy = 0.0
        for ci in range(w // wc):
            sl = slice(ci * wc, (ci + 1) * wc)
            dq, dk, dv, dbias, ds = _bwd_chunk(
                q_s[:, sl].reshape(h * wc, d),
                k_s[:, sl].reshape(h * wc, d),
                v_s[:, sl].reshape(h * wc, d),
                do_s[:, sl].reshape(h * wc, d),
                bc_ref[hd],
                sc_ref[...],
                sy,
                d,
            )
            dq_ref[0, :, sl, ch] += dq.reshape(h, wc, d).astype(dq_ref.dtype)
            dk_ref[0, :, sl, ch] += dk.reshape(h, wc, d).astype(dk_ref.dtype)
            dv_ref[0, :, sl, ch] += dv.reshape(h, wc, d).astype(dv_ref.dtype)
            dbc_ref[hd] += dbias
            dsy += ds
        dscale_ref[hd, 1] += dsy


@functools.lru_cache(maxsize=None)
def _make_fused(
    bt: int, h: int, w: int, heads: int, d: int, gr: int, wc: int,
    dtype_name: str, interpret: bool,
):
    dtype = jnp.dtype(dtype_name)
    c = heads * d
    ctr, ctc = gr * w, h * wc
    grid = (bt,)

    qkv_spec = pl.BlockSpec(
        (1, h, w, c), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    br_spec = pl.BlockSpec(
        (heads, ctr, ctr), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
    )
    bc_spec = pl.BlockSpec(
        (heads, ctc, ctc), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
    )
    sr_spec = pl.BlockSpec((ctr, ctr), lambda b: (0, 0), memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((ctc, ctc), lambda b: (0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((heads, 2), lambda b: (0, 0), memory_space=pltpu.SMEM)

    kdims = dict(h=h, w=w, heads=heads, d=d, gr=gr, wc=wc)
    # The default 16MB scoped-vmem budget is conservative; the unrolled
    # per-head loop plus double-buffered (H, W, C) blocks need more headroom
    # (same pattern as the upstream splash-attention kernels).
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **kdims),
        grid=grid,
        in_specs=[scale_spec, qkv_spec, qkv_spec, qkv_spec, br_spec, bc_spec, sr_spec, sc_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bt, h, w, c), dtype),
        scratch_shapes=[pltpu.VMEM((h, w, d), jnp.float32)] * 3,
        compiler_params=cparams,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, **kdims),
        grid=grid,
        in_specs=[
            scale_spec, qkv_spec, qkv_spec, qkv_spec, br_spec, bc_spec,
            sr_spec, sc_spec, qkv_spec,
        ],
        out_specs=[
            qkv_spec, qkv_spec, qkv_spec, br_spec, bc_spec,
            pl.BlockSpec((heads, 2), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((bt, h, w, c), dtype),
            jax.ShapeDtypeStruct((heads, ctr, ctr), jnp.float32),
            jax.ShapeDtypeStruct((heads, ctc, ctc), jnp.float32),
            jax.ShapeDtypeStruct((heads, 2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((h, w, d), jnp.float32)] * 4,
        compiler_params=cparams,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(q, k, v, br, bc, sr, sc, scale):
        return fwd_call(scale, q, k, v, br, bc, sr, sc)

    def fused_fwd(q, k, v, br, bc, sr, sc, scale):
        out = fwd_call(scale, q, k, v, br, bc, sr, sc)
        return out, (q, k, v, br, bc, sr, sc, scale)

    def fused_bwd(res, do):
        q, k, v, br, bc, sr, sc, scale = res
        dq, dk, dv, dbr, dbc, dscale = bwd_call(scale, q, k, v, br, bc, sr, sc, do)
        return dq, dk, dv, dbr, dbc, jnp.zeros_like(sr), jnp.zeros_like(sc), dscale

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_axial_attention(
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
    """Fused row+column axial attention on ``(BT, H, W, heads, d)`` q/k/v.

    Numerically equal to averaging two ``scaled_axial_attention`` calls (rows:
    sequence W with ``bias_x``/``scale_x``; columns: sequence H with
    ``bias_y``/``scale_y``): ``0.5 * (attn_rows + attn_cols)``.
    """
    bt, h, w, heads, d = q.shape
    if chunk_target is None:
        import os

        chunk_target = int(os.environ.get("BUBBLEFORMER_FUSED_CHUNK", "128"))
    gr = _chunk_windows(h, w, chunk_target)
    wc = _chunk_windows(w, h, chunk_target)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    br = pack_row_bias(bias_x, heads, gr, w)
    bc = pack_col_bias(bias_y, heads, h, wc)
    sr = jnp.asarray(_seg_rows(gr, w))
    sc = jnp.asarray(_seg_cols(h, wc))
    ones = jnp.ones((heads,), jnp.float32)
    scale = jnp.stack(
        [
            (scale_x if scale_x is not None else ones).astype(jnp.float32),
            (scale_y if scale_y is not None else ones).astype(jnp.float32),
        ],
        axis=1,
    )

    common = jnp.promote_types(jnp.promote_types(q.dtype, k.dtype), v.dtype)
    fused = _make_fused(bt, h, w, heads, d, gr, wc, str(common), bool(interpret))
    # Kernel works on the well-aligned 4D (BT, H, W, C) layout; the merge of
    # (heads, d) -> C is a free minor-axis reshape.
    c = heads * d
    out = fused(
        q.astype(common).reshape(bt, h, w, c),
        k.astype(common).reshape(bt, h, w, c),
        v.astype(common).reshape(bt, h, w, c),
        br, bc, sr, sc, scale,
    )
    # Named so the 'dots' remat policy saves the kernel output instead of
    # re-running the (opaque-to-XLA) kernel in the backward pass.
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_attn")
    return out.reshape(bt, h, w, heads, d)

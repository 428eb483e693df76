"""Pallas TPU kernel v5: lane-major chunk-matmul axial attention.

The round-2 kernels established two facts (ABLATIONS_r02.json): the axial
branch costs ~7.6 ms/block fwd+bwd of which only ~4.2 is the head-packed
attention core — the rest is per-head staging/serialization in the natural
(H, W, C) layout; and the temporal megakernel's lane-major ``(C, tokens)``
layout does the equivalent staging as all-heads slab ops for ~0.5 ms/block.
Two round-3 probes sized the replacement core (DESIGN.md):

* VPU within-block lane rolls (``scripts/probe_lane_axial.py``): 2.72
  ms/block fwd for the 64-offset core — loses once a roll-heavy backward is
  added (negative result, backward not written).
* per-head MXU chunk matmuls (``scripts/probe_chunk_axial.py``): attention
  over a W-token axis as ``S = dot(q_c (d, 128), k_c (d, 128), contract
  sublanes)`` per (head, 128-lane chunk) — one native MXU tile per op with
  only ``128/W``x block-diagonal waste (vs 24x for head-packing, whose
  few-big-dispatch shape only matters at an XLA boundary; in-kernel, a
  matmul op has no dispatch cost).

This kernel runs the chunk-matmul core at the **dual-layout QKV boundary**:

* inputs are the interleaved QKV tensor in lane-major ``(3C, N)`` form in
  BOTH axial layouts — h-major lanes (rows pass) and w-major lanes (columns
  pass).  Because the QKV projection acts on channels and the layout
  permutation acts on lanes, they commute: the w-major QKV is just the
  XLA-transposed QKV tensor, so the second layout costs one HBM relayout,
  not a second projection and not an in-kernel (N, N) permutation matmul.
* qk-LayerNorm is computed in-kernel on all heads at once via the
  head-leading ``(heads, d, N)`` view (the temporal megakernel's
  ``_qkln_all``), with the hand-written all-heads LN backward.
* each axis emits its own attn_scale-blended output slab; the 0.5 average,
  InstanceNorm2 and the output Dense stay in XLA (measured ~0.15 ms of
  already-fused ops — absorbing them bought nothing for v4), which also
  means the column output never needs an in-kernel back-transpose: the
  final lane permutation commutes with the per-channel epilogue and is one
  more cheap XLA relayout.
* the attn_scale low-frequency term (uniform window attention) is folded
  into the probability matrix before the value matmul — ``o = v @ (s_h p +
  (1-s_h) Mblk/blk)^T`` — so each chunk is two MXU matmuls forward; the
  same fold removes the pv/vm recomputes from the backward, whose
  value-path gradients all come out of one ``G = dao^T v`` matrix.

The backward is fully hand-written: it restages q/k/v flash-style,
recomputes each chunk's softmax, and expresses every gradient as chunk
matmuls in the same layout; qk-LN/bias/scale gradients accumulate in VMEM
across the sequential grid (the pattern of ``ops/temporal_block_mega.py``).
Reference semantics: ``bubbleformer/layers/attention.py:199-319`` (shared
QKV for both axes, per-axis T5 bias and per-head attn_scale, row/column
average).  Parameter paths match the XLA impls, so checkpoints are
interchangeable across ``attn_impl`` settings.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bubbleformer_tpu.ops.temporal_block_mega import _qkln_all

_NEG = -1e9


def _pick_chunk(blk: int, n: int, target: int = 256) -> int:
    """Chunk size: a multiple of the window ``blk`` near ``target`` lanes,
    dividing the ``n``-lane slab evenly.

    ``target`` trades block-diagonal matmul waste (factor ``target/blk``)
    against sequential chunk count — the chunk FLOPs are trivial next to
    the MXU's throughput, so fewer/larger ops win until VMEM pressure or
    softmax width dominates.  Measured on the flagship 32x32/384 axial
    stack (fwd+bwd ms/step, ABLATIONS_r02.json): 128 -> 65.1, 256 -> 61.8,
    512 -> 67.6; default 256."""
    nb = n // blk
    kk = min(max(1, target // blk), nb)
    while nb % kk:
        kk -= 1
    return blk * kk


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


def _grid_chunk(h: int, w: int, c: int, n: int, budget: int = int(60e6)) -> int:
    """Lanes per grid step for the v6 streaming kernel.

    Must cover whole rows in the h-major layout AND whole columns in the
    w-major layout (multiple of lcm(w, h)) and stay lane-tile-aligned
    (multiple of 128); within that, as large as keeps the ~86*C*chunk-byte
    working set under ``budget`` so fewer grid steps amortize fixed
    per-step cost while slabs still stream from HBM."""
    align = _lcm(_lcm(h, w), 128)
    if align >= n or n % align:
        return n
    nk = n // align
    try:
        # Sweep hook: cap the per-step chunk (e.g. 256) to trade VMEM
        # residency for DMA/compute overlap granularity.
        cap = int(os.environ.get("BUBBLEFORMER_LANE_GRID", "0"))
    except ValueError:
        cap = 0
    if cap:
        budget = min(budget, 86 * c * max(align, cap))
    k = max(1, min(nk, budget // (86 * c * align)))
    while nk % k:
        k -= 1
    return align * k


def _resolve_chunk_target() -> int:
    """The BUBBLEFORMER_LANE_CHUNK env override, clamped to the swept
    128-512 range (values outside it grow the per-head (ch, ch) tables and
    chunk temporaries beyond what the VMEM gate budgets for)."""
    try:
        t = int(os.environ.get("BUBBLEFORMER_LANE_CHUNK", "256"))
    except ValueError:
        t = 256
    return max(128, min(512, t))


def lane_axial_supported(
    h: int, w: int, c: int, heads: int, target: int | None = None
) -> bool:
    """Shape gate for routing ``attn_impl='auto'`` to this kernel.

    Requires lane-aligned slabs and the backward working set of ONE grid
    step (the v6 kernel streams ``_grid_chunk`` lanes per step from HBM, so
    the budget is per-chunk, not per-image — this is what admits the 64x64
    and 32x128 token grids v5 excluded) inside the 128 MiB VMEM budget with
    headroom.  ``target`` is the resolved chunk-lane target (defaults to
    the clamped BUBBLEFORMER_LANE_CHUNK env value) — the per-head (ch, ch)
    logit tables and their backward accumulators scale with it, so the
    gate folds them in rather than assuming the default 256.
    """
    n = h * w
    d = c // heads
    if c % heads or n % 128 or d % 8:
        return False
    if max(h, w) > 512:  # (ch, ch) chunk tables stay one-tile-ish
        return False
    gch = _grid_chunk(h, w, c, n)
    if target is None:
        target = _resolve_chunk_target()
    ch_r = _pick_chunk(w, gch, target)
    ch_c = _pick_chunk(h, gch, target)
    # f32 logit tables (heads*ch, ch) per axis, live fwd + dtbl accumulators
    # in the backward.
    table_bytes = 8 * heads * (ch_r * ch_r + ch_c * ch_c)
    # Backward working set per grid step: qkv/qkvt in-windows double-
    # buffered (24 C*gch bytes bf16), dor/doc (8), dqkv/dqkvt out-windows
    # (24), staged q/kv scratches (6), f32 dq/dkv scratches (12), chunk
    # temporaries + staged f32 values (~12).  86 C*gch + tables must fit
    # the 128 MiB VMEM space with headroom.
    return 86 * c * gch + table_bytes <= int(100e6)


def _build_table(bias, heads: int, blk: int, ch: int):
    """Per-head (ch, ch) additive logit tables, stacked to (heads*ch, ch).

    Diagonal ``blk x blk`` blocks carry the T5 bias (differentiable: built
    with tile/where so the VJP sums the diagonal blocks back); everything
    off-block is -1e9, which the in-chunk softmax turns into exact zeros.
    """
    k = ch // blk
    mask = np.kron(np.eye(k, dtype=np.float32), np.ones((blk, blk), np.float32))
    neg = jnp.asarray((1.0 - mask) * _NEG)
    if bias is None:
        tbl = jnp.broadcast_to(neg, (heads, ch, ch))
    else:
        tiled = jnp.tile(bias.astype(jnp.float32), (1, k, k))
        tbl = tiled * jnp.asarray(mask) + neg
    return tbl.reshape(heads * ch, ch)


def _stage(qkv, ln_ref, q_s, kv_s, heads, d):
    """All-heads qk-LayerNorm staging from the interleaved (3C, N) slab
    value into q (C, N) / k|v (2C, N) scratches.  Returns per-head LN stats
    for the backward (each (heads, N))."""
    c = heads * d
    n = qkv.shape[-1]
    q, qmu, qinv = _qkln_all(qkv, ln_ref, heads, d, 0)
    k, kmu, kinv = _qkln_all(qkv, ln_ref, heads, d, 1)
    v = qkv.reshape(heads, 3, d, n)[:, 2].reshape(c, n)
    q_s[...] = q.astype(q_s.dtype)
    kv_s[0:c, :] = k.astype(kv_s.dtype)
    kv_s[c : 2 * c, :] = v.astype(kv_s.dtype)
    return qmu, qinv, kmu, kinv


def _axis_fwd(q_s, kv_s, tbl_ref, mblk_ref, scale_ref, axis_idx, o_ref,
              heads, d, ch, n):
    """One axial direction: per-(head, chunk) MXU attention off the slabs.

    Writes the attn_scale-blended output directly into ``o_ref[0]``
    slices (``o_ref``: the (1, C, N) output block ref)."""
    scaling = d**-0.5
    c = heads * d
    mblk = mblk_ref[...]  # (ch, ch) f32, kron(I, ones/blk)
    for hd in range(heads):
        rows = slice(hd * d, (hd + 1) * d)
        vrows = slice(c + hd * d, c + (hd + 1) * d)
        trows = slice(hd * ch, (hd + 1) * ch)
        s_h = scale_ref[hd, axis_idx]
        for ci in range(n // ch):
            sl = slice(ci * ch, (ci + 1) * ch)
            qc = q_s[rows, sl]
            kc = kv_s[rows, sl]
            vc = kv_s[vrows, sl]
            s = (
                jax.lax.dot_general(
                    qc, kc, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scaling
                + tbl_ref[trows, :]
            )
            p = jax.nn.softmax(s, axis=-1)
            # attn_scale blend folded into the probability matrix:
            # o = v @ (s_h p + (1-s_h) Mblk/blk)^T — one matmul, no
            # separate window-mean matmul (Mblk is block-diag symmetric).
            pb = (s_h * p + (1.0 - s_h) * mblk).astype(vc.dtype)
            o_ref[0, rows, sl] = jax.lax.dot_general(
                vc, pb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


def _fwd_kernel(
    scale_ref, qkv_ref, qkvt_ref, ln_ref, br_ref, bc_ref, mr_ref, mc_ref,
    or_ref, oc_ref, q_s, kv_s,
    *, n, heads, d, ch_r, ch_c, bm=False,
):
    # bm (batch-minor): qkv slabs arrive as (3C, n) windows of a flat
    # (3C, BT*N) tensor — the layout the stationary-weight XLA projection
    # emits with zero 3C-wide transposes (lane_axial_attention_from_x).
    qkv3 = qkv_ref[...] if bm else qkv_ref[0]
    qkvt3 = qkvt_ref[...] if bm else qkvt_ref[0]
    _stage(qkv3.astype(jnp.float32), ln_ref, q_s, kv_s, heads, d)
    _axis_fwd(q_s, kv_s, br_ref, mr_ref, scale_ref, 0, or_ref,
              heads, d, ch_r, n)
    _stage(qkvt3.astype(jnp.float32), ln_ref, q_s, kv_s, heads, d)
    _axis_fwd(q_s, kv_s, bc_ref, mc_ref, scale_ref, 1, oc_ref,
              heads, d, ch_c, n)


def _axis_bwd(q_s, kv_s, dao, tbl_ref, mblk_ref, scale_ref, axis_idx,
              dtbl_ref, dq_s, dkv_s, heads, d, ch, n):
    """Chunk backward for one direction.  ``dao``: (C, N) f32 upstream grad
    of this axis's kernel output.  Fills dq_s/dkv_s (f32 slabs, w.r.t. the
    POST-LN q/k and raw v), accumulates the wide bias-table gradient, and
    returns the (heads, ch) attn-scale gradient rows."""
    c = heads * d
    scaling = d**-0.5
    mblk = mblk_ref[...]  # (ch, ch) f32, kron(I, ones/blk)
    dsc_rows = []
    for hd in range(heads):
        rows = slice(hd * d, (hd + 1) * d)
        vrows = slice(c + hd * d, c + (hd + 1) * d)
        trows = slice(hd * ch, (hd + 1) * ch)
        s_h = scale_ref[hd, axis_idx]
        acc = None
        for ci in range(n // ch):
            sl = slice(ci * ch, (ci + 1) * ch)
            qc = q_s[rows, sl]
            kc = kv_s[rows, sl]
            vc = kv_s[vrows, sl]
            dao_bf = dao[rows, sl].astype(vc.dtype)
            s = (
                jax.lax.dot_general(
                    qc, kc, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scaling
                + tbl_ref[trows, :]
            )
            p = jax.nn.softmax(s, axis=-1)
            # G(i,j) = sum_d dao(d,i) v(d,j) carries every value-path grad:
            # dp = s_h G; dscale = sum (p - Mblk/blk) . G (no pv/vm needed).
            g_mat = jax.lax.dot_general(
                dao_bf, vc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            part = jnp.sum((p - mblk) * g_mat, axis=0, keepdims=True)
            acc = part if acc is None else acc + part
            dp = s_h * g_mat
            rowsum = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = p * (dp - rowsum)
            dtbl_ref[trows, :] += ds
            ds_bf = ds.astype(vc.dtype)
            dq = jax.lax.dot_general(
                kc, ds_bf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk = jax.lax.dot_general(
                qc, ds_bf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dv = dao @ (s_h p + (1-s_h) Mblk/blk): the same blended
            # probability matrix as the forward, one matmul.
            pb = (s_h * p + (1.0 - s_h) * mblk).astype(vc.dtype)
            dv = jax.lax.dot_general(
                dao_bf, pb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_s[rows, sl] = dq * scaling
            dkv_s[rows, sl] = dk * scaling
            dkv_s[vrows, sl] = dv
        dsc_rows.append(acc)
    return jnp.concatenate(dsc_rows, axis=0)


def _qkln_bwd(qkv, dy3, mu, inv, ln_ref, which, dln_ref, out_ref, heads, d,
              bm=False):
    """All-heads qk-LayerNorm backward; writes the raw-component gradient
    rows of the interleaved (3C, N) output ref (temporal megakernel
    pattern)."""
    n = qkv.shape[-1]
    comp = qkv.reshape(heads, 3, d, n)[:, which]
    xhat = (comp - mu.reshape(heads, 1, n)) * inv.reshape(heads, 1, n)
    col = 2 * which
    dln_ref[:, col : col + 1] += jnp.sum(dy3 * xhat, axis=(0, 2)).reshape(d, 1)
    dln_ref[:, col + 1 : col + 2] += jnp.sum(dy3, axis=(0, 2)).reshape(d, 1)
    g = ln_ref[:, col : col + 1]
    dyg = dy3 * g
    m1 = jnp.mean(dyg, axis=1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=1, keepdims=True)
    draw = (inv.reshape(heads, 1, n) * (dyg - m1 - xhat * m2)).astype(
        out_ref.dtype
    )
    for hd in range(heads):
        base = hd * 3 * d + which * d
        if bm:
            out_ref[base : base + d, :] = draw[hd]
        else:
            out_ref[0, base : base + d, :] = draw[hd]


def _layout_bwd(qkv3, ln_ref, tbl_ref, mblk_ref, scale_ref, axis_idx, do3,
                dqkv3, dln_ref, dtbl_ref, q_s, kv_s, dq_s, dkv_s,
                heads, d, ch, n, bm=False):
    """Full backward for one layout: restage, chunk grads, LN backward."""
    c = heads * d
    qkv = qkv3.astype(jnp.float32)
    qmu, qinv, kmu, kinv = _stage(qkv, ln_ref, q_s, kv_s, heads, d)
    dsc = _axis_bwd(q_s, kv_s, do3.astype(jnp.float32), tbl_ref, mblk_ref,
                    scale_ref, axis_idx, dtbl_ref, dq_s, dkv_s,
                    heads, d, ch, n)
    _qkln_bwd(qkv, dq_s[...].reshape(heads, d, n), qmu, qinv, ln_ref, 0,
              dln_ref, dqkv3, heads, d, bm)
    _qkln_bwd(qkv, dkv_s[0:c, :].reshape(heads, d, n), kmu, kinv, ln_ref, 1,
              dln_ref, dqkv3, heads, d, bm)
    for hd in range(heads):
        base = hd * 3 * d + 2 * d
        dv = dkv_s[c + hd * d : c + (hd + 1) * d, :].astype(dqkv3.dtype)
        if bm:
            dqkv3[base : base + d, :] = dv
        else:
            dqkv3[0, base : base + d, :] = dv
    return dsc


def _bwd_kernel(
    scale_ref, qkv_ref, qkvt_ref, ln_ref, br_ref, bc_ref, mr_ref, mc_ref,
    dor_ref, doc_ref,
    dqkv_ref, dqkvt_ref, dln_ref, dbr_ref, dbc_ref, dsr_ref, dsc_ref,
    q_s, kv_s, dq_s, dkv_s,
    *, n, heads, d, ch_r, ch_c, bm=False,
):
    first = pl.program_id(0) + pl.program_id(1) == 0

    @pl.when(first)
    def _():
        dln_ref[...] = jnp.zeros_like(dln_ref[...])
        dbr_ref[...] = jnp.zeros_like(dbr_ref[...])
        dbc_ref[...] = jnp.zeros_like(dbc_ref[...])
        dsr_ref[...] = jnp.zeros_like(dsr_ref[...])
        dsc_ref[...] = jnp.zeros_like(dsc_ref[...])

    qkv3 = qkv_ref[...] if bm else qkv_ref[0]
    qkvt3 = qkvt_ref[...] if bm else qkvt_ref[0]
    dsr = _layout_bwd(qkv3, ln_ref, br_ref, mr_ref, scale_ref, 0,
                      dor_ref[0], dqkv_ref, dln_ref, dbr_ref,
                      q_s, kv_s, dq_s, dkv_s, heads, d, ch_r, n, bm)
    dsr_ref[...] += dsr
    dsc = _layout_bwd(qkvt3, ln_ref, bc_ref, mc_ref, scale_ref, 1,
                      doc_ref[0], dqkvt_ref, dln_ref, dbc_ref,
                      q_s, kv_s, dq_s, dkv_s, heads, d, ch_c, n, bm)
    dsc_ref[...] += dsc


def _fwd_kernel_px(
    scale_ref, x_ref, xt_ref, wqkvt_ref, bqkv_ref, ln_ref, br_ref, bc_ref,
    mr_ref, mc_ref, or_ref, oc_ref, qkv_s, q_s, kv_s,
    *, n, heads, d, ch_r, ch_c,
):
    """v7: QKV projection in-kernel (stationary ``wqkvt`` (3C, C) in VMEM,
    one MXU matmul per layout per chunk).  Deletes the dual (3C, BT*N) QKV
    slabs from HBM entirely — the r05 scanned profile shows ~8 ms/step of
    XLA projection matmuls paying transposing-layout penalties plus the
    slab write/read traffic at the old boundary."""
    c = heads * d
    for x_in, tbl_ref, mblk_ref, axis_idx, o_ref, ch in (
        (x_ref, br_ref, mr_ref, 0, or_ref, ch_r),
        (xt_ref, bc_ref, mc_ref, 1, oc_ref, ch_c),
    ):
        qkv_s[...] = (
            jax.lax.dot_general(
                wqkvt_ref[...], x_in[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv_ref[...]
        ).astype(qkv_s.dtype)
        _stage(qkv_s[...].astype(jnp.float32), ln_ref, q_s, kv_s, heads, d)
        _axis_fwd(q_s, kv_s, tbl_ref, mblk_ref, scale_ref, axis_idx, o_ref,
                  heads, d, ch, n)


def _bwd_kernel_px(
    scale_ref, x_ref, xt_ref, wqkvt_ref, bqkv_ref, ln_ref, br_ref, bc_ref,
    mr_ref, mc_ref, dor_ref, doc_ref,
    dx_ref, dxt_ref, dw_ref, db_ref, dln_ref, dbr_ref, dbc_ref,
    dsr_ref, dsc_ref,
    qkv_s, q_s, kv_s, dq_s, dkv_s,
    *, n, heads, d, ch_r, ch_c,
):
    first = pl.program_id(0) + pl.program_id(1) == 0

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])
        dln_ref[...] = jnp.zeros_like(dln_ref[...])
        dbr_ref[...] = jnp.zeros_like(dbr_ref[...])
        dbc_ref[...] = jnp.zeros_like(dbc_ref[...])
        dsr_ref[...] = jnp.zeros_like(dsr_ref[...])
        dsc_ref[...] = jnp.zeros_like(dsc_ref[...])

    f32 = jnp.float32
    for x_in, tbl_ref, mblk_ref, axis_idx, do_ref, dx_out, dtbl_ref, dsc_acc, ch in (
        (x_ref, br_ref, mr_ref, 0, dor_ref, dx_ref, dbr_ref, dsr_ref, ch_r),
        (xt_ref, bc_ref, mc_ref, 1, doc_ref, dxt_ref, dbc_ref, dsc_ref, ch_c),
    ):
        xn = x_in[0]
        # Recompute the projection exactly as the forward stored it (f32
        # accumulate, cast to the activation dtype) so staging matches.
        qkv_s[...] = (
            jax.lax.dot_general(
                wqkvt_ref[...], xn, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + bqkv_ref[...]
        ).astype(qkv_s.dtype)
        qkv_f = qkv_s[...].astype(f32)
        # Attention + qk-LN backward; the raw-QKV gradient is written IN
        # PLACE over the (dead) recomputed qkv scratch (bm=True indexing).
        dsc = _layout_bwd(
            qkv_f, ln_ref, tbl_ref, mblk_ref, scale_ref, axis_idx,
            do_ref[0], qkv_s, dln_ref, dtbl_ref, q_s, kv_s, dq_s, dkv_s,
            heads, d, ch, n, bm=True,
        )
        dsc_acc[...] += dsc
        dqkv = qkv_s[...]
        # Projection backward: dW^T accumulates across the grid; dx leaves
        # per chunk.
        dw_ref[...] += jax.lax.dot_general(
            dqkv, xn, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
        db_ref[...] += jnp.sum(dqkv.astype(f32), axis=1, keepdims=True)
        dx_out[0] = jax.lax.dot_general(
            wqkvt_ref[...], dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(dx_out.dtype)


@functools.lru_cache(maxsize=None)
def _make_lane_axial_px(
    bt: int, n: int, heads: int, d: int, ch_r: int, ch_c: int,
    blk_r: int, blk_c: int, dtype_name: str, interpret: bool,
    grid_ch: int | None = None,
):
    """v7 factory: dual-layout C-wide inputs, projection in-kernel."""
    dtype = jnp.dtype(dtype_name)
    c = heads * d
    gch = n if grid_ch is None else grid_ch
    grid = (bt, n // gch)

    x_spec = pl.BlockSpec(
        (1, c, gch), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, (lambda i, j: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    scale_spec = pl.BlockSpec(
        (heads, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM
    )

    mr = np.kron(
        np.eye(ch_r // blk_r, dtype=np.float32),
        np.full((blk_r, blk_r), 1.0 / blk_r, np.float32),
    )
    mc = np.kron(
        np.eye(ch_c // blk_c, dtype=np.float32),
        np.full((blk_c, blk_c), 1.0 / blk_c, np.float32),
    )

    kdims = dict(n=gch, heads=heads, d=d, ch_r=ch_r, ch_c=ch_c)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)
    in_specs = [
        scale_spec, x_spec, x_spec, const((3 * c, c)), const((3 * c, 1)),
        const((d, 4)),
        const((heads * ch_r, ch_r)), const((heads * ch_c, ch_c)),
        const((ch_r, ch_r)), const((ch_c, ch_c)),
    ]

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel_px, **kdims),
        grid=grid,
        in_specs=in_specs,
        out_specs=[x_spec, x_spec],
        out_shape=[jax.ShapeDtypeStruct((bt, c, n), dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((3 * c, gch), dtype),
            pltpu.VMEM((c, gch), dtype),
            pltpu.VMEM((2 * c, gch), dtype),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel_px, **kdims),
        grid=grid,
        in_specs=in_specs + [x_spec, x_spec],
        out_specs=[
            x_spec, x_spec, const((3 * c, c)), const((3 * c, 1)),
            const((d, 4)),
            const((heads * ch_r, ch_r)), const((heads * ch_c, ch_c)),
            const((heads, ch_r)), const((heads, ch_c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, c, n), dtype),
            jax.ShapeDtypeStruct((bt, c, n), dtype),
            jax.ShapeDtypeStruct((3 * c, c), jnp.float32),
            jax.ShapeDtypeStruct((3 * c, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, 4), jnp.float32),
            jax.ShapeDtypeStruct((heads * ch_r, ch_r), jnp.float32),
            jax.ShapeDtypeStruct((heads * ch_c, ch_c), jnp.float32),
            jax.ShapeDtypeStruct((heads, ch_r), jnp.float32),
            jax.ShapeDtypeStruct((heads, ch_c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3 * c, gch), dtype),
            pltpu.VMEM((c, gch), dtype),
            pltpu.VMEM((2 * c, gch), dtype),
            pltpu.VMEM((c, gch), jnp.float32),
            pltpu.VMEM((2 * c, gch), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(x, xt, wqkvt, bqkv, ln, br, bc, scale):
        o_row, o_colt = fwd_call(scale, x, xt, wqkvt, bqkv, ln, br, bc, mr, mc)
        return o_row, o_colt

    def fused_fwd(x, xt, wqkvt, bqkv, ln, br, bc, scale):
        outs = fwd_call(scale, x, xt, wqkvt, bqkv, ln, br, bc, mr, mc)
        return outs, (x, xt, wqkvt, bqkv, ln, br, bc, scale)

    def fused_bwd(res, cots):
        x, xt, wqkvt, bqkv, ln, br, bc, scale = res
        do_r, do_ct = cots
        (dx, dxt, dw, db, dln, dbr, dbc, dsr_w, dsc_w) = bwd_call(
            scale, x, xt, wqkvt, bqkv, ln, br, bc, mr, mc, do_r, do_ct
        )
        dscale = jnp.stack(
            [jnp.sum(dsr_w, axis=1), jnp.sum(dsc_w, axis=1)], axis=1
        )
        return dx, dxt, dw, db, dln, dbr, dbc, dscale

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


@functools.lru_cache(maxsize=None)
def _make_lane_axial(
    bt: int, n: int, heads: int, d: int, ch_r: int, ch_c: int,
    blk_r: int, blk_c: int, dtype_name: str, interpret: bool,
    grid_ch: int | None = None, x_batch_minor: bool = False,
    out_flat: bool = False,
):
    """``grid_ch``: lanes processed per grid step (v6 streaming).  The whole
    kernel is lane-chunk-parallel (qk-LN normalizes over channels per token;
    the attention windows are block-diagonal within a chunk), so slabs
    stream from HBM ``grid_ch`` lanes at a time and the VMEM working set is
    independent of ``n`` — this is what admits the 64x64 / 32x128 token
    grids the whole-slab v5 gate had to exclude.  ``grid_ch = n`` (the
    default) reproduces v5 exactly."""
    dtype = jnp.dtype(dtype_name)
    c = heads * d
    gch = n if grid_ch is None else grid_ch
    grid = (bt, n // gch)

    if x_batch_minor:
        # Flat (3C, BT*N) qkv tensors: the layout the stationary-weight XLA
        # projection produces without any 3C-wide transpose.  Chunks never
        # cross an image boundary because gch divides N.
        nch = n // gch
        slab3 = pl.BlockSpec(
            (3 * c, gch),
            lambda i, j: (0, i * nch + j),
            memory_space=pltpu.VMEM,
        )
        qkv_shape = (3 * c, bt * n)
    else:
        slab3 = pl.BlockSpec(
            (1, 3 * c, gch), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        qkv_shape = (bt, 3 * c, n)
    slab = pl.BlockSpec(
        (1, c, gch), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    if out_flat:
        # Channel-major carry: outputs (and their cotangents) are flat
        # (1, C, BT*N) tensors windowed along lanes — the carry layout of
        # models/axial_vit.py carry="cm", so the per-block (bt, c, n) <->
        # NHWC back-transposes disappear.
        nch_o = n // gch
        slab_o = pl.BlockSpec(
            (1, c, gch),
            lambda i, j: (0, 0, i * nch_o + j),
            memory_space=pltpu.VMEM,
        )
        o_shape = (1, c, bt * n)
    else:
        slab_o = slab
        o_shape = (bt, c, n)
    const = lambda shape: pl.BlockSpec(
        shape, (lambda i, j: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    scale_spec = pl.BlockSpec(
        (heads, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM
    )

    # Plain numpy (lru-cached factory; a traced jnp constant would leak).
    # Mblk/blk: the uniform-window attention matrix the attn_scale blend
    # mixes in, kept f32 (exact for any window length).
    mr = np.kron(
        np.eye(ch_r // blk_r, dtype=np.float32),
        np.full((blk_r, blk_r), 1.0 / blk_r, np.float32),
    )
    mc = np.kron(
        np.eye(ch_c // blk_c, dtype=np.float32),
        np.full((blk_c, blk_c), 1.0 / blk_c, np.float32),
    )

    kdims = dict(
        n=gch, heads=heads, d=d, ch_r=ch_r, ch_c=ch_c, bm=x_batch_minor
    )
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)
    in_specs = [
        scale_spec, slab3, slab3, const((d, 4)),
        const((heads * ch_r, ch_r)), const((heads * ch_c, ch_c)),
        const((ch_r, ch_r)), const((ch_c, ch_c)),
    ]

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **kdims),
        grid=grid,
        in_specs=in_specs,
        out_specs=[slab_o, slab_o],
        out_shape=[jax.ShapeDtypeStruct(o_shape, dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((c, gch), dtype),
            pltpu.VMEM((2 * c, gch), dtype),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, **kdims),
        grid=grid,
        in_specs=in_specs + [slab_o, slab_o],
        out_specs=[
            slab3, slab3, const((d, 4)),
            const((heads * ch_r, ch_r)), const((heads * ch_c, ch_c)),
            const((heads, ch_r)), const((heads, ch_c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qkv_shape, dtype),
            jax.ShapeDtypeStruct(qkv_shape, dtype),
            jax.ShapeDtypeStruct((d, 4), jnp.float32),
            jax.ShapeDtypeStruct((heads * ch_r, ch_r), jnp.float32),
            jax.ShapeDtypeStruct((heads * ch_c, ch_c), jnp.float32),
            jax.ShapeDtypeStruct((heads, ch_r), jnp.float32),
            jax.ShapeDtypeStruct((heads, ch_c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, gch), dtype),
            pltpu.VMEM((2 * c, gch), dtype),
            pltpu.VMEM((c, gch), jnp.float32),
            pltpu.VMEM((2 * c, gch), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(qkv, qkvt, ln, br, bc, scale):
        o_row, o_colt = fwd_call(scale, qkv, qkvt, ln, br, bc, mr, mc)
        return o_row, o_colt

    def fused_fwd(qkv, qkvt, ln, br, bc, scale):
        outs = fwd_call(scale, qkv, qkvt, ln, br, bc, mr, mc)
        return outs, (qkv, qkvt, ln, br, bc, scale)

    def fused_bwd(res, cots):
        qkv, qkvt, ln, br, bc, scale = res
        do_r, do_ct = cots
        (dqkv, dqkvt, dln, dbr, dbc, dsr_w, dsc_w) = bwd_call(
            scale, qkv, qkvt, ln, br, bc, mr, mc, do_r, do_ct
        )
        dscale = jnp.stack(
            [jnp.sum(dsr_w, axis=1), jnp.sum(dsc_w, axis=1)], axis=1
        )
        return dqkv, dqkvt, dln, dbr, dbc, dscale

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def lane_axial_attention(
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
    interpret: bool | None = None,
    grid_lanes: int | None = None,
) -> jax.Array:
    """Axial attention from the raw interleaved QKV tensor, lane-major.

    ``qkv``: ``(BT, H, W, 3C)`` — the ``input_head`` Dense output (the
    ``fused_block`` boundary).  Returns the averaged row/column attention
    output ``(BT, H, W, C)`` after qk-LayerNorm, per-axis T5 bias and
    attn_scale blending — numerically the reference chain
    ``bubbleformer/layers/attention.py:199-307`` up to InstanceNorm2.

    ``grid_lanes`` overrides the per-grid-step streaming chunk (testing
    hook; the default is :func:`_grid_chunk` on TPU and the whole slab in
    interpret mode).
    """
    bt, h, w, c3 = qkv.shape
    c = c3 // 3
    if heads is None:
        raise ValueError("heads must be given")
    d = c // heads
    n = h * w
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    target = _resolve_chunk_target()
    if grid_lanes is not None:
        gch = grid_lanes
    else:
        gch = n if interpret else _grid_chunk(h, w, c, n)
    ch_r = _pick_chunk(w, gch, target)
    ch_c = _pick_chunk(h, gch, target)
    if not interpret and not lane_axial_supported(h, w, c, heads, target):
        raise ValueError(
            f"attn_impl='lane' does not support token grid {h}x{w} with "
            f"C={c}, heads={heads} (needs h*w % 128 == 0, head_dim % 8 == "
            f"0, max(h, w) <= 512). Use attn_impl='fused_block' for this "
            f"shape, or 'auto' which routes per-shape."
        )

    f32 = jnp.float32
    ln = jnp.stack(
        [
            qn_scale.astype(f32),
            qn_bias.astype(f32),
            kn_scale.astype(f32),
            kn_bias.astype(f32),
        ],
        axis=1,
    )
    ones = jnp.ones((heads,), f32)
    scale = jnp.stack(
        [
            (scale_x if scale_x is not None else ones).astype(f32),
            (scale_y if scale_y is not None else ones).astype(f32),
        ],
        axis=1,
    )

    dtype = qkv.dtype
    # Lane-major relayouts (XLA HBM transposes — the projection and the
    # layout permutation commute, so the w-major QKV is a pure relayout).
    qkv_cm = qkv.reshape(bt, n, c3).transpose(0, 2, 1)
    qkv_cm_t = (
        qkv.transpose(0, 2, 1, 3).reshape(bt, n, c3).transpose(0, 2, 1)
    )
    return _run_lane(
        qkv_cm, qkv_cm_t, ln, scale, bias_x, bias_y,
        bt, h, w, n, heads, d, ch_r, ch_c, gch, dtype, interpret,
    )


def _run_lane(qkv_cm, qkv_cm_t, ln, scale, bias_x, bias_y,
              bt, h, w, n, heads, d, ch_r, ch_c, gch, dtype, interpret,
              x_batch_minor=False, out_cm=False):
    c = heads * d
    f32 = jnp.float32
    br = _build_table(bias_x, heads, w, ch_r)
    bc = _build_table(bias_y, heads, h, ch_c)
    fused = _make_lane_axial(
        bt, n, heads, d, ch_r, ch_c, w, h, str(dtype), bool(interpret),
        grid_ch=gch, x_batch_minor=x_batch_minor, out_flat=out_cm,
    )
    o_row, o_colt = fused(qkv_cm, qkv_cm_t, ln, br, bc, scale)
    if out_cm:
        # Channel-major carry: keep the flat (C, BT*N) layout; only the
        # column output needs its w-major lane permutation undone.
        o_r = o_row.reshape(c, bt * n)
        o_c = (
            o_colt.reshape(c, bt, w, h).swapaxes(2, 3).reshape(c, bt * n)
        )
        out = (0.5 * (o_r.astype(f32) + o_c.astype(f32))).astype(dtype)
        return jax.ad_checkpoint.checkpoint_name(out, "flash_attn")
    o_r = o_row.transpose(0, 2, 1).reshape(bt, h, w, c)
    o_c = (
        o_colt.transpose(0, 2, 1).reshape(bt, w, h, c).transpose(0, 2, 1, 3)
    )
    out = (0.5 * (o_r.astype(f32) + o_c.astype(f32))).astype(dtype)
    return jax.ad_checkpoint.checkpoint_name(out, "flash_attn")


def lane_axial_attention_from_x(
    x: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    qn_scale: jax.Array,
    qn_bias: jax.Array,
    kn_scale: jax.Array,
    kn_bias: jax.Array,
    bias_x: jax.Array | None = None,
    bias_y: jax.Array | None = None,
    scale_x: jax.Array | None = None,
    scale_y: jax.Array | None = None,
    heads: int | None = None,
    interpret: bool | None = None,
    lean: bool = False,
    proj: str | None = None,
) -> jax.Array:
    """Lane axial attention from the block input ``x`` (pre-QKV).

    Moves the dual-layout boundary from the 3C-wide QKV tensor to the
    C-wide input: relayout ``x`` into both lane-major layouts (3x less HBM
    relayout traffic than transposing QKV, forward and backward) and run
    the stationary-weight projection once per layout in XLA — the extra
    (3C, C) @ (C, N) matmul is noise on the MXU next to the copies it
    deletes (profiled ~4.8 ms/step of {2,1,0}<->{1,2,0} QKV copies at the
    flagship).  ``x``: ``(BT, H, W, C)`` — the InstanceNorm1 output.

    ``lean=True`` (memory-lean boundary, DESIGN.md round-4 note): the dual
    projections are expressed as BATCHED dots — the weight broadcast over
    images, batch dims over BT — so the ``dots_with_no_batch_dims_saveable``
    remat policy RECOMPUTES them in the backward instead of saving two
    (3C, BT*N) tensors per block.  The policy decision happens on the
    jaxpr's dimension numbers; XLA's algebraic simplifier still lowers the
    stationary-weight matmul efficiently.  Per block under the "dots"
    policy this saves only the C-wide kernel output (vs fused_block's
    3C-wide QKV dot) — the routing that unjams ``scan_blocks`` configs
    (b8-scan OOM'd with the saved dual-QKV boundary, BENCH_MATRIX_r04).
    """
    bt, h, w, c = x.shape
    if heads is None:
        raise ValueError("heads must be given")
    d = c // heads
    n = h * w
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    target = _resolve_chunk_target()
    gch = n if interpret else _grid_chunk(h, w, c, n)
    ch_r = _pick_chunk(w, gch, target)
    ch_c = _pick_chunk(h, gch, target)
    if not interpret and not lane_axial_supported(h, w, c, heads, target):
        raise ValueError(
            f"attn_impl='lane' does not support token grid {h}x{w} with "
            f"C={c}, heads={heads} (needs h*w % 128 == 0, head_dim % 8 == "
            f"0, max(h, w) <= 512). Use attn_impl='fused_block' for this "
            f"shape, or 'auto' which routes per-shape."
        )

    f32 = jnp.float32
    ln = jnp.stack(
        [
            qn_scale.astype(f32),
            qn_bias.astype(f32),
            kn_scale.astype(f32),
            kn_bias.astype(f32),
        ],
        axis=1,
    )
    ones = jnp.ones((heads,), f32)
    scale = jnp.stack(
        [
            (scale_x if scale_x is not None else ones).astype(f32),
            (scale_y if scale_y is not None else ones).astype(f32),
        ],
        axis=1,
    )

    dtype = x.dtype
    wt = wqkv.astype(dtype).T  # (3C, C)
    bcol = bqkv.astype(f32).reshape(3 * c, 1)

    if proj is None:
        proj = os.environ.get("BUBBLEFORMER_LANE_PROJ", "xla")
    if proj == "kernel":
        # v7, MEASURED NEGATIVE at the flagship shape (2026-08-20): the
        # projection computed INSIDE the kernel (stationary (3C, C) weight
        # in VMEM) deletes the dual (3C, BT*N) QKV slabs from HBM, but the
        # depth-12 axial stack measures 64.8 ms vs 60.3 with the XLA
        # projections (flagship step 112.7 vs 107.5): Mosaic executes the
        # per-grid-step projection matmuls serially with the attention
        # compute, losing more than the deleted slab traffic + transposing-
        # layout penalty was worth.  Kept selectable (BUBBLEFORMER_LANE_PROJ
        # =kernel) with golden tests; it is also inherently memory-lean
        # (nothing projection-sized is saveable under the dots policy).
        x_b = x.reshape(bt, n, c).transpose(0, 2, 1)  # (BT, C, N)
        x_bt = x.transpose(0, 2, 1, 3).reshape(bt, n, c).transpose(0, 2, 1)
        br = _build_table(bias_x, heads, w, ch_r)
        bc = _build_table(bias_y, heads, h, ch_c)
        fused = _make_lane_axial_px(
            bt, n, heads, d, ch_r, ch_c, w, h, str(dtype), bool(interpret),
            grid_ch=gch,
        )
        o_row, o_colt = fused(x_b, x_bt, wt, bcol, ln, br, bc, scale)
        o_r = o_row.transpose(0, 2, 1).reshape(bt, h, w, c)
        o_c = (
            o_colt.transpose(0, 2, 1).reshape(bt, w, h, c).transpose(0, 2, 1, 3)
        )
        out = (0.5 * (o_r.astype(f32) + o_c.astype(f32))).astype(dtype)
        return jax.ad_checkpoint.checkpoint_name(out, "flash_attn")

    if lean:
        # Same relayout traffic (one C-wide transpose per layout), but kept
        # batched 3-D so the projection dot carries jaxpr batch dims.
        x_b = x.reshape(bt, n, c).transpose(0, 2, 1)  # (BT, C, N)
        x_bt = x.transpose(0, 2, 1, 3).reshape(bt, n, c).transpose(0, 2, 1)
        wt_b = jnp.broadcast_to(wt, (bt,) + wt.shape)

        def project_b(xc):
            # Batched (BT) stationary-weight matmul -> (BT, 3C, N), which is
            # exactly the kernel's non-flat qkv layout.  NOT saveable under
            # dots_with_no_batch_dims_saveable -> recomputed in the backward.
            y = jax.lax.dot_general(
                wt_b, xc, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )
            return (y + bcol).astype(dtype)

        return _run_lane(
            project_b(x_b), project_b(x_bt), ln, scale, bias_x, bias_y,
            bt, h, w, n, heads, d, ch_r, ch_c, gch, dtype, interpret,
        )

    # ONE C-wide relayout per layout: (BT*N, C) -> (C, BT*N); the w-major
    # variant fuses its lane permutation into the same copy.
    x_cm = x.reshape(bt * n, c).T
    x_cm_t = x.transpose(0, 2, 1, 3).reshape(bt * n, c).T

    def project(xc):
        # (3C, C) @ (C, BT*N) -> (3C, BT*N): stationary-weight MXU matmul
        # whose output IS the kernel's flat batch-minor layout.
        y = jax.lax.dot_general(
            wt, xc, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        return (y + bcol).astype(dtype)

    return _run_lane(
        project(x_cm), project(x_cm_t), ln, scale, bias_x, bias_y,
        bt, h, w, n, heads, d, ch_r, ch_c, gch, dtype, interpret,
        x_batch_minor=True,
    )


def lane_axial_attention_cm(
    x_cm: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    qn_scale: jax.Array,
    qn_bias: jax.Array,
    kn_scale: jax.Array,
    kn_bias: jax.Array,
    bias_x: jax.Array | None = None,
    bias_y: jax.Array | None = None,
    scale_x: jax.Array | None = None,
    scale_y: jax.Array | None = None,
    heads: int | None = None,
    h: int | None = None,
    w: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Lane axial attention in the channel-major carry, flat in/out.

    ``x_cm``: flat ``(C, BT*N)`` InstanceNorm1 output with lanes ordered
    (bt, h, w) — the carry layout of ``models/axial_vit.py`` ``carry="cm"``
    and exactly the h-major lane-major layout that
    :func:`lane_axial_attention_from_x` otherwise creates by relayout.  In
    this mode only the w-major twin costs a copy (the h-major input and the
    row output are already in carry layout), and the averaged output is
    returned flat ``(C, BT*N)``.
    """
    c, btn = x_cm.shape
    if heads is None or h is None or w is None:
        raise ValueError("heads, h and w must be given")
    d = c // heads
    n = h * w
    bt = btn // n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    target = _resolve_chunk_target()
    gch = n if interpret else _grid_chunk(h, w, c, n)
    ch_r = _pick_chunk(w, gch, target)
    ch_c = _pick_chunk(h, gch, target)
    if not interpret and not lane_axial_supported(h, w, c, heads, target):
        raise ValueError(
            f"attn_impl='lane' does not support token grid {h}x{w} with "
            f"C={c}, heads={heads} (needs h*w % 128 == 0, head_dim % 8 == "
            f"0, max(h, w) <= 512). Use attn_impl='fused_block' for this "
            f"shape, or 'auto' which routes per-shape."
        )

    f32 = jnp.float32
    ln = jnp.stack(
        [
            qn_scale.astype(f32),
            qn_bias.astype(f32),
            kn_scale.astype(f32),
            kn_bias.astype(f32),
        ],
        axis=1,
    )
    ones = jnp.ones((heads,), f32)
    scale = jnp.stack(
        [
            (scale_x if scale_x is not None else ones).astype(f32),
            (scale_y if scale_y is not None else ones).astype(f32),
        ],
        axis=1,
    )

    dtype = x_cm.dtype
    # The w-major twin: the only relayout in this mode (projection and lane
    # permutation commute, as in lane_axial_attention_from_x).
    x_cm_t = x_cm.reshape(c, bt, h, w).swapaxes(2, 3).reshape(c, btn)
    wt = wqkv.astype(dtype).T  # (3C, C)
    bcol = bqkv.astype(f32).reshape(3 * c, 1)

    def project(xc):
        y = jax.lax.dot_general(
            wt, xc, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        return (y + bcol).astype(dtype)

    return _run_lane(
        project(x_cm), project(x_cm_t), ln, scale, bias_x, bias_y,
        bt, h, w, n, heads, d, ch_r, ch_c, gch, dtype, interpret,
        x_batch_minor=True, out_cm=True,
    )

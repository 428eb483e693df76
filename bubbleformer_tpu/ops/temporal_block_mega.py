"""Pallas TPU kernel: the whole temporal-attention branch as one megakernel.

The temporal ``AttentionBlock`` of the reference
(``bubbleformer/layers/attention.py:26-117``: norm1 -> 1x1-conv QKV ->
qk-LayerNorm -> attention over the T axis -> norm2 -> 1x1-conv out) attends
over tiny sequences (T ~ 5) batched over every spatial token.  All XLA
formulations are op-count-bound on this device: the batched-matmul form
relays 6-D tensors around sliver-sized MXU matmuls (12-stack: 100.4 ms) and
the trace-time-unrolled multiply-reduce form (``ops/attention.py:
unrolled_axis_attention``, 12-stack: 49.1 ms) still issues ~40 XLA kernel
launches per block at ~0.1 ms dispatch each (DESIGN.md round-2 profile: ~220
multiply-reduce fusions per step are this branch).  Per image the entire
branch touches only ~4 MB of activations — it fits in VMEM whole.

The kernel works in a **transposed, channels-first layout** ``(C, T*N)``
(tokens along lanes, channels along sublanes) with every stage expressed as
full-width slab ops — no per-head or per-timestep loops anywhere:

* the projections are stationary-weight MXU matmuls
  ``W^T (3C, C) @ x (C, T*N)`` with ideal dimensions;
* qk-LayerNorm runs on a head-leading ``(heads, d, T*N)`` view of the QKV
  rows (leading-dim reshape + one sublane-block mean), InstanceNorm on
  per-``t`` lane blocks;
* the T x T attention is batched over lanes with **lane rolls of the whole
  k/v slab**: rolling the ``(2C, T*N)`` slab left by ``r*N`` lanes aligns
  timestep ``(i+r) mod T`` under timestep ``i`` for every head at once, so
  ONE multiply + segment-reduce per offset ``r`` computes the logits of
  every (position, head, i, j=(i+r)%T) pair — T slab ops replace the
  T^2-pair/per-head unroll.  Probabilities broadcast back to value rows
  with ``pltpu.repeat``; the T5 bias is a precomputed per-offset lane
  table; ``attn_scale`` blending is a per-head-constant column vector.

The backward pass is fully hand-written in a second kernel: it recomputes
the cheap forward chain flash-style (the attention output ``ao`` is saved as
a second forward output to skip the IN2-input recompute), rolls the k/v
gradients back as one fused ``(2C, T*N)`` slab per offset
(``dkv += roll([dl*q | p*dpv], +r*N)``), and accumulates every weight
gradient in VMEM across the sequential batch grid — the pattern established
by the axial megakernel (``ops/axial_block_mega.py``).  Bias and attn-scale
gradients leave the kernel as wide per-lane rows that XLA reduces (cheap,
once per block).

A first, row-major per-(head, pair)-unrolled variant is recorded as a
negative result in DESIGN.md: ~1200 trace statements of (N, 1)-shaped ops
compiled >20 minutes and VMEM-OOMed at depth 12.  Lane-minor layouts waste
128x on (N, 1) temporaries, and Mosaic compile time scales with statement
count; this slab formulation is ~20x fewer statements, all full-width.

Selectable as ``attn_impl='mega'`` on ``TemporalAttentionBlock``.  Parameter
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IN_EPS = 1e-5
_LN_EPS = 1e-5


def _in_fwd_t(x_t, aff_ref, t_len, n):
    """InstanceNorm in (C, T*N) layout: per-(t, channel) stats over the N
    lanes of each t block.  ``aff_ref``: (C, 2) [scale | bias] f32.  Returns
    (y blocks f32, mu blocks (C, 1), inv blocks (C, 1)).

    Only the tiny per-channel stats are returned — the backward recomputes
    ``xhat = (x - mu) * inv`` on demand instead of carrying (C, N) xhat
    slabs, which is what blew the register budget in the first bwd kernel
    (100 MiB of spill slots)."""
    ys, mus, invs = [], [], []
    for t in range(t_len):
        xt = x_t[:, t * n : (t + 1) * n].astype(jnp.float32)
        mu = jnp.mean(xt, axis=1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xt * xt, axis=1, keepdims=True) - mu * mu, 0.0
        )
        inv = jax.lax.rsqrt(var + _IN_EPS)
        ys.append((xt - mu) * inv * aff_ref[:, 0:1] + aff_ref[:, 1:2])
        mus.append(mu)
        invs.append(inv)
    return ys, mus, invs


def _in_bwd_t(dy, xhat, inv, aff_ref):
    """InstanceNorm backward for one t lane block in (C, N) layout."""
    dg = dy * aff_ref[:, 0:1]
    m1 = jnp.mean(dg, axis=1, keepdims=True)
    m2 = jnp.mean(dg * xhat, axis=1, keepdims=True)
    return inv * (dg - m1 - xhat * m2)


def _roll_left(x, r, n, t_len):
    """Circular lane roll moving block i+r under block i.

    Expressed as two static lane slices + concat rather than ``pltpu.roll``:
    the shifts are trace-time constants, and Mosaic lowers roll to
    ``tpu.dynamic_rotate`` which is unimplemented for sub-32-bit data (the
    k/v slab is bf16)."""
    if not r:
        return x
    cut = r * n
    return jnp.concatenate([x[:, cut:], x[:, :cut]], axis=1)


def _roll_right(x, r, n, t_len):
    """Inverse of :func:`_roll_left`."""
    if not r:
        return x
    cut = (t_len - r) * n
    return jnp.concatenate([x[:, cut:], x[:, :cut]], axis=1)


def _seg_sum(x, heads, d):
    """(heads*d, L) -> per-head sublane-block sums (heads, L)."""
    return jnp.sum(x.reshape(heads, d, x.shape[-1]), axis=1)


def _expand_heads(x, d):
    """(heads, L) -> (heads*d, L): broadcast each head row over its d rows.

    NOTE: ``pltpu.repeat`` has tile semantics ([r0 r1 r0 r1 ...]), not
    numpy-repeat semantics — a leading-dim broadcast keeps head-major order.
    """
    heads, l = x.shape
    return jnp.broadcast_to(x.reshape(heads, 1, l), (heads, d, l)).reshape(
        heads * d, l
    )


def _qkln_all(qkv, ln_ref, heads, d, which):
    """qk-LayerNorm for ALL heads at once on the head-leading 3D view.

    ``qkv``: the (3C, T*N) f32 projection output; ``which``: 0 for q
    (affine cols 0/1), 1 for k (cols 2/3).  Returns (normed (C, T*N), mu
    (heads, T*N), inv (heads, T*N)) — xhat is recomputed from the stats in
    the backward rather than carried as a live slab."""
    tn = qkv.shape[-1]
    comp = qkv.reshape(heads, 3, d, tn)[:, which]  # (heads, d, T*N)
    mu = jnp.mean(comp, axis=1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(comp * comp, axis=1, keepdims=True) - mu * mu, 0.0
    )
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (comp - mu) * inv  # (heads, d, T*N)
    g = ln_ref[:, 2 * which : 2 * which + 1]  # (d, 1)
    b = ln_ref[:, 2 * which + 1 : 2 * which + 2]
    y = xhat * g + b
    return y.reshape(heads * d, tn), mu[:, 0, :], inv[:, 0, :]


def _stage_attention(qkv_s, ln_ref, q_s, kv_s, heads, d):
    """Fill q_s (C, T*N) / kv_s (2C, T*N) head-major from the interleaved
    QKV scratch, with qk-LayerNorm applied to q and k.  Returns the small
    per-head LN stats (qmu, qinv, kmu, kinv), each (heads, T*N)."""
    tn = qkv_s.shape[-1]
    qkv = qkv_s[...].astype(jnp.float32)
    q, qmu, qinv = _qkln_all(qkv, ln_ref, heads, d, 0)
    k, kmu, kinv = _qkln_all(qkv, ln_ref, heads, d, 1)
    v = qkv.reshape(heads, 3, d, tn)[:, 2].reshape(heads * d, tn)
    q_s[...] = q.astype(q_s.dtype)
    kv_s[0 : heads * d, :] = k.astype(kv_s.dtype)
    kv_s[heads * d : 2 * heads * d, :] = v.astype(kv_s.dtype)
    return qmu, qinv, kmu, kinv


def _attention_fwd(q_s, kv_s, bias_ref, scol_ref, t_len, n, heads, d):
    """All-heads T x T attention via whole-slab lane rolls.

    Returns (o, p_list, pv, vmean): o is the attn_scale-blended (C, T*N)
    f32 output.  The rolled k/v slabs are deliberately NOT returned: keeping
    2*t_len f32 (C, T*N) slabs live across the backward blew the 128 MiB
    VMEM budget (measured 142.2 MiB at the flagship shape); the backward
    re-rolls the bf16 kv scratch per offset instead — a lane shuffle is far
    cheaper than the VMEM it would pin."""
    c = heads * d
    scaling = d**-0.5
    q = q_s[...].astype(jnp.float32)

    logits = []
    for r in range(t_len):
        k_r = _roll_left(kv_s[0:c, :], r, n, t_len)  # bf16 lane shuffle
        l = _seg_sum(q * k_r, heads, d) * scaling  # (heads, T*N) f32
        logits.append(l + bias_ref[r * heads : (r + 1) * heads, :])
    m = logits[0]
    for r in range(1, t_len):
        m = jnp.maximum(m, logits[r])
    exps = [jnp.exp(l - m) for l in logits]
    z = exps[0]
    for r in range(1, t_len):
        z = z + exps[r]
    inv_z = 1.0 / z
    p_list = [e * inv_z for e in exps]

    pv = None
    vmean = None
    for r in range(t_len):
        v_r = _roll_left(kv_s[c : 2 * c, :], r, n, t_len)
        pv_c = _expand_heads(p_list[r], d) * v_r
        pv = pv_c if pv is None else pv + pv_c
        vmean = v_r.astype(jnp.float32) if vmean is None else vmean + v_r
    vmean = vmean * (1.0 / t_len)
    s = scol_ref[...]  # (C, 1) per-head-constant column
    o = s * pv + (1.0 - s) * vmean
    return o, p_list, pv, vmean


def _attention_probs(q, kv_s, bias_ref, t_len, n, heads, d):
    """Recompute just the softmax probabilities: T tiny (heads, T*N) rows.

    Backward-pass helper — unlike :func:`_attention_fwd` it materializes no
    (C, T*N) value slabs (pv/vmean/o), only per-head logit rows."""
    c = heads * d
    scaling = d**-0.5
    logits = []
    for r in range(t_len):
        k_r = _roll_left(kv_s[0:c, :], r, n, t_len)
        l = _seg_sum(q * k_r, heads, d) * scaling
        logits.append(l + bias_ref[r * heads : (r + 1) * heads, :])
    m = logits[0]
    for r in range(1, t_len):
        m = jnp.maximum(m, logits[r])
    exps = [jnp.exp(l - m) for l in logits]
    z = exps[0]
    for r in range(1, t_len):
        z = z + exps[r]
    inv_z = 1.0 / z
    return [e * inv_z for e in exps]


def _fwd_kernel(
    x_ref, in1_ref, wqkvt_ref, bqkv_ref, ln_ref, in2_ref,
    woutt_ref, bout_ref, bias_ref, scol_ref, o_ref, ao_ref,
    qkv_s, q_s, kv_s, ao_s,
    *, t_len, n, heads, d,
):
    # InstanceNorm1 + one stationary-weight QKV matmul (3C, C) @ (C, T*N).
    xn_blocks, _, _ = _in_fwd_t(x_ref[0], in1_ref, t_len, n)
    xn = jnp.concatenate(xn_blocks, axis=1).astype(q_s.dtype)
    qkv_s[...] = (
        jax.lax.dot_general(
            wqkvt_ref[...], xn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...]
    ).astype(qkv_s.dtype)

    _stage_attention(qkv_s, ln_ref, q_s, kv_s, heads, d)
    o = _attention_fwd(q_s, kv_s, bias_ref, scol_ref, t_len, n, heads, d)[0]
    ao_s[...] = o

    ao_ref[0] = o.astype(ao_ref.dtype)
    y2_blocks, _, _ = _in_fwd_t(ao_s[...], in2_ref, t_len, n)
    y2 = jnp.concatenate(y2_blocks, axis=1).astype(q_s.dtype)
    out = jax.lax.dot_general(
        woutt_ref[...], y2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bout_ref[...]
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(
    x_ref, in1_ref, wqkvt_ref, bqkv_ref, ln_ref, in2_ref,
    woutt_ref, bout_ref, bias_ref, scol_ref, ao_ref, do_ref,
    dx_ref, din1_ref, dwqkvt_ref, dbqkv_ref, dln_ref, din2_ref,
    dwoutt_ref, dbout_ref, dbias_ref, dscale_ref,
    qkv_s, q_s, kv_s, dao_s, dkv_s,
    *, t_len, n, heads, d,
):
    """Whole-branch backward, register-budget-aware.

    The first version of this kernel carried every recomputed slab (qhat,
    khat, pv, vmean, dpv, the stacked dqkv) as live values and spilled
    100 MiB of registers (VMEM OOM at the flagship shape, log in DESIGN.md).
    This version keeps only per-head ROWS live across stages:

    * LN/IN residuals are (rows of) stats; xhat slabs recompute on demand;
    * with ``w_r = seg_sum(dao * v_r)`` per offset, both ``dp_r = s_h*w_r``
      and the attn-scale gradient ``sum_r (p_r - 1/T) * w_r`` are row
      algebra — pv/vmean/dpv never materialize;
    * dk/dv accumulate into an explicit f32 scratch and dqkv is written
      per-head INTO the (dead) QKV scratch instead of a stacked register.
    """
    b = pl.program_id(0)
    c = heads * d
    tn = t_len * n
    scaling = d**-0.5
    f32 = jnp.float32

    @pl.when(b == 0)
    def _():
        din1_ref[...] = jnp.zeros_like(din1_ref[...])
        dwqkvt_ref[...] = jnp.zeros_like(dwqkvt_ref[...])
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref[...])
        dln_ref[...] = jnp.zeros_like(dln_ref[...])
        din2_ref[...] = jnp.zeros_like(din2_ref[...])
        dwoutt_ref[...] = jnp.zeros_like(dwoutt_ref[...])
        dbout_ref[...] = jnp.zeros_like(dbout_ref[...])
        dbias_ref[...] = jnp.zeros_like(dbias_ref[...])
        dscale_ref[...] = jnp.zeros_like(dscale_ref[...])

    # ---- Recompute IN1 + QKV projection + q/k/v staging ----
    xn_blocks, _, _ = _in_fwd_t(x_ref[0], in1_ref, t_len, n)
    qkv_s[...] = (
        jax.lax.dot_general(
            wqkvt_ref[...],
            jnp.concatenate(xn_blocks, axis=1).astype(q_s.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bqkv_ref[...]
    ).astype(qkv_s.dtype)
    qmu, qinv, kmu, kinv = _stage_attention(
        qkv_s, ln_ref, q_s, kv_s, heads, d
    )

    # ---- Output Dense + InstanceNorm2 backward -> dao (scratch) ----
    y2_blocks, mu2s, inv2s = _in_fwd_t(ao_ref[0], in2_ref, t_len, n)
    y2 = jnp.concatenate(y2_blocks, axis=1).astype(q_s.dtype)
    do = do_ref[0]
    # dW_out^T (C, C) = do (C, T*N) @ y2 (C, T*N)^T  (contract lanes).
    dwoutt_ref[...] += jax.lax.dot_general(
        do, y2, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    dbout_ref[...] += jnp.sum(do.astype(f32), axis=1, keepdims=True)
    # dy2 (C, T*N) = W_out (C, C) @ do: contract the out-channel dim of both.
    dy2 = jax.lax.dot_general(
        woutt_ref[...], do, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    for t in range(t_len):
        sl = slice(t * n, (t + 1) * n)
        dy2_t = dy2[:, sl]
        xhat2_t = (ao_ref[0][:, sl].astype(f32) - mu2s[t]) * inv2s[t]
        din2_ref[:, 0:1] += jnp.sum(dy2_t * xhat2_t, axis=1, keepdims=True)
        din2_ref[:, 1:2] += jnp.sum(dy2_t, axis=1, keepdims=True)
        dao_s[:, sl] = _in_bwd_t(dy2_t, xhat2_t, inv2s[t], in2_ref).astype(
            dao_s.dtype
        )

    # ---- Attention backward: all heads at once, row algebra ----
    q = q_s[...].astype(f32)
    p_list = _attention_probs(q, kv_s, bias_ref, t_len, n, heads, d)
    s = scol_ref[...]  # (C, 1) per-head-constant column
    s_h = s.reshape(heads, d, 1)[:, 0]  # (heads, 1)

    # One per-offset row w_r = seg_sum(dao * v_r) carries everything:
    # dp_r = s_h * w_r, and dscale = sum_r (p_r - 1/T) * w_r.
    w_list = []
    dscale = None
    for r in range(t_len):
        v_r = _roll_left(kv_s[c : 2 * c, :], r, n, t_len)
        w_r = _seg_sum(dao_s[...].astype(f32) * v_r, heads, d)
        w_list.append(w_r)
        ds_c = (p_list[r] - 1.0 / t_len) * w_r
        dscale = ds_c if dscale is None else dscale + ds_c
    dscale_ref[...] += dscale
    inner = None
    for r in range(t_len):
        in_c = p_list[r] * (s_h * w_list[r])
        inner = in_c if inner is None else inner + in_c

    # vmean backward: every j receives (1-s)/T * sum_i dao_i.
    dmean = (1.0 - s) * dao_s[...].astype(f32) * (1.0 / t_len)
    bsum = dmean[:, 0:n]
    for t in range(1, t_len):
        bsum = bsum + dmean[:, t * n : (t + 1) * n]

    sdao = (s * dao_s[...].astype(f32)).astype(q_s.dtype)
    dq = None
    dkv_s[...] = jnp.zeros_like(dkv_s[...])
    for r in range(t_len):
        dl = p_list[r] * (s_h * w_list[r] - inner)  # (heads, T*N) f32
        dbias_ref[r * heads : (r + 1) * heads, :] += dl
        dl_e = _expand_heads(dl, d)
        dq_c = dl_e * _roll_left(kv_s[0:c, :], r, n, t_len) * scaling
        dq = dq_c if dq is None else dq + dq_c
        dkv_s[0:c, :] += _roll_right(dl_e * q * scaling, r, n, t_len)
        dkv_s[c : 2 * c, :] += _roll_right(
            _expand_heads(p_list[r], d) * sdao, r, n, t_len
        ).astype(f32)

    # ---- qk-LayerNorm backward; dqkv written in place over qkv_s ----
    # Component rows of the interleaved (heads, 3, d) QKV layout are
    # disjoint, so q rows can be overwritten while k's are still read.
    for which, dy3, mu, inv in (
        (0, dq.reshape(heads, d, tn), qmu, qinv),
        (1, None, kmu, kinv),
    ):
        if dy3 is None:
            dy3 = dkv_s[0:c, :].reshape(heads, d, tn)
        col = 2 * which
        comp = qkv_s[...].astype(f32).reshape(heads, 3, d, tn)[:, which]
        xhat = (comp - mu.reshape(heads, 1, tn)) * inv.reshape(heads, 1, tn)
        dln_ref[:, col : col + 1] += jnp.sum(dy3 * xhat, axis=(0, 2)).reshape(
            d, 1
        )
        dln_ref[:, col + 1 : col + 2] += jnp.sum(dy3, axis=(0, 2)).reshape(
            d, 1
        )
        g = ln_ref[:, col : col + 1]  # (d, 1)
        dyg = dy3 * g
        m1 = jnp.mean(dyg, axis=1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=1, keepdims=True)
        draw = (
            inv.reshape(heads, 1, tn) * (dyg - m1 - xhat * m2)
        ).astype(qkv_s.dtype)
        for h in range(heads):
            base = h * 3 * d + which * d
            qkv_s[base : base + d, :] = draw[h]
    for h in range(heads):
        base = h * 3 * d + 2 * d
        qkv_s[base : base + d, :] = (
            dkv_s[c + h * d : c + (h + 1) * d, :]
            + jnp.concatenate([bsum[h * d : (h + 1) * d, :]] * t_len, axis=1)
        ).astype(qkv_s.dtype)

    # ---- QKV Dense + InstanceNorm1 backward -> dx ----
    dqkv = qkv_s[...]
    xn_blocks, mu1s, inv1s = _in_fwd_t(x_ref[0], in1_ref, t_len, n)
    # dW_qkv^T (3C, C) = dqkv (3C, T*N) @ xn (C, T*N)^T (contract lanes).
    dwqkvt_ref[...] += jax.lax.dot_general(
        dqkv,
        jnp.concatenate(xn_blocks, axis=1).astype(q_s.dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    dbqkv_ref[...] += jnp.sum(dqkv.astype(f32), axis=1, keepdims=True)
    # dxn (C, T*N) = W_qkv^T^T @ dqkv: contract the 3C dim of both.
    dxn = jax.lax.dot_general(
        wqkvt_ref[...], dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    for t in range(t_len):
        sl = slice(t * n, (t + 1) * n)
        dxn_t = dxn[:, sl]
        xhat1_t = (x_ref[0][:, sl].astype(f32) - mu1s[t]) * inv1s[t]
        din1_ref[:, 0:1] += jnp.sum(dxn_t * xhat1_t, axis=1, keepdims=True)
        din1_ref[:, 1:2] += jnp.sum(dxn_t, axis=1, keepdims=True)
        dx_ref[0, :, sl] = _in_bwd_t(
            dxn_t, xhat1_t, inv1s[t], in1_ref
        ).astype(dx_ref.dtype)


def _core_fwd_kernel(
    x_ref, wqkvt_ref, bqkv_ref, ln_ref, bias_ref, scol_ref, ao_ref,
    qkv_s, q_s, kv_s,
    *, t_len, n, heads, d,
):
    """Streamed temporal core: QKV projection + qk-LN + T x T attention on
    one ``n``-token chunk (all T timesteps of those tokens).  IN1/IN2 and
    the output Dense stay in XLA — the chunk working set is then
    independent of the token count, which admits shapes outside the whole-
    branch megakernel's VMEM gate (avit_big's C=768 grid)."""
    c = heads * d
    xn = x_ref[0].reshape(c, t_len * n)
    qkv_s[...] = (
        jax.lax.dot_general(
            wqkvt_ref[...], xn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...]
    ).astype(qkv_s.dtype)
    _stage_attention(qkv_s, ln_ref, q_s, kv_s, heads, d)
    o = _attention_fwd(q_s, kv_s, bias_ref, scol_ref, t_len, n, heads, d)[0]
    ao_ref[0] = o.reshape(c, t_len, n).astype(ao_ref.dtype)


def _core_bwd_kernel(
    x_ref, wqkvt_ref, bqkv_ref, ln_ref, bias_ref, scol_ref, dao_ref,
    dx_ref, dwqkvt_ref, dbqkv_ref, dln_ref, dbias_ref, dscale_ref,
    qkv_s, q_s, kv_s, dkv_s,
    *, t_len, n, heads, d,
):
    """Hand-written backward of the streamed core (the attention/qk-LN/
    projection section of :func:`_bwd_kernel`, chunk-local); weight/bias
    gradients accumulate in VMEM across the (batch, chunk) grid."""
    first = pl.program_id(0) + pl.program_id(1) == 0
    c = heads * d
    tn = t_len * n
    scaling = d**-0.5
    f32 = jnp.float32

    @pl.when(first)
    def _():
        dwqkvt_ref[...] = jnp.zeros_like(dwqkvt_ref[...])
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref[...])
        dln_ref[...] = jnp.zeros_like(dln_ref[...])
        dbias_ref[...] = jnp.zeros_like(dbias_ref[...])
        dscale_ref[...] = jnp.zeros_like(dscale_ref[...])

    # ---- Recompute projection + staging ----
    xn = x_ref[0].reshape(c, tn)
    qkv_s[...] = (
        jax.lax.dot_general(
            wqkvt_ref[...], xn, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + bqkv_ref[...]
    ).astype(qkv_s.dtype)
    qmu, qinv, kmu, kinv = _stage_attention(
        qkv_s, ln_ref, q_s, kv_s, heads, d
    )

    # ---- Attention backward: row algebra over per-offset w_r ----
    q = q_s[...].astype(f32)
    dao = dao_ref[0].reshape(c, tn).astype(f32)
    p_list = _attention_probs(q, kv_s, bias_ref, t_len, n, heads, d)
    s = scol_ref[...]
    s_h = s.reshape(heads, d, 1)[:, 0]

    w_list = []
    dscale = None
    for r in range(t_len):
        v_r = _roll_left(kv_s[c : 2 * c, :], r, n, t_len)
        w_r = _seg_sum(dao * v_r, heads, d)
        w_list.append(w_r)
        ds_c = (p_list[r] - 1.0 / t_len) * w_r
        dscale = ds_c if dscale is None else dscale + ds_c
    dscale_ref[...] += dscale
    inner = None
    for r in range(t_len):
        in_c = p_list[r] * (s_h * w_list[r])
        inner = in_c if inner is None else inner + in_c

    dmean = (1.0 - s) * dao * (1.0 / t_len)
    bsum = dmean[:, 0:n]
    for t in range(1, t_len):
        bsum = bsum + dmean[:, t * n : (t + 1) * n]

    sdao = (s * dao).astype(q_s.dtype)
    dq = None
    dkv_s[...] = jnp.zeros_like(dkv_s[...])
    for r in range(t_len):
        dl = p_list[r] * (s_h * w_list[r] - inner)
        dbias_ref[r * heads : (r + 1) * heads, :] += dl
        dl_e = _expand_heads(dl, d)
        dq_c = dl_e * _roll_left(kv_s[0:c, :], r, n, t_len) * scaling
        dq = dq_c if dq is None else dq + dq_c
        dkv_s[0:c, :] += _roll_right(dl_e * q * scaling, r, n, t_len)
        dkv_s[c : 2 * c, :] += _roll_right(
            _expand_heads(p_list[r], d) * sdao, r, n, t_len
        ).astype(f32)

    # ---- qk-LayerNorm backward; dqkv written in place over qkv_s ----
    for which, dy3, mu, inv in (
        (0, dq.reshape(heads, d, tn), qmu, qinv),
        (1, None, kmu, kinv),
    ):
        if dy3 is None:
            dy3 = dkv_s[0:c, :].reshape(heads, d, tn)
        col = 2 * which
        comp = qkv_s[...].astype(f32).reshape(heads, 3, d, tn)[:, which]
        xhat = (comp - mu.reshape(heads, 1, tn)) * inv.reshape(heads, 1, tn)
        dln_ref[:, col : col + 1] += jnp.sum(dy3 * xhat, axis=(0, 2)).reshape(
            d, 1
        )
        dln_ref[:, col + 1 : col + 2] += jnp.sum(dy3, axis=(0, 2)).reshape(
            d, 1
        )
        g = ln_ref[:, col : col + 1]
        dyg = dy3 * g
        m1 = jnp.mean(dyg, axis=1, keepdims=True)
        m2 = jnp.mean(dyg * xhat, axis=1, keepdims=True)
        draw = (
            inv.reshape(heads, 1, tn) * (dyg - m1 - xhat * m2)
        ).astype(qkv_s.dtype)
        for h in range(heads):
            base = h * 3 * d + which * d
            qkv_s[base : base + d, :] = draw[h]
    for h in range(heads):
        base = h * 3 * d + 2 * d
        qkv_s[base : base + d, :] = (
            dkv_s[c + h * d : c + (h + 1) * d, :]
            + jnp.concatenate([bsum[h * d : (h + 1) * d, :]] * t_len, axis=1)
        ).astype(qkv_s.dtype)

    # ---- Projection backward -> dxn ----
    dqkv = qkv_s[...]
    dwqkvt_ref[...] += jax.lax.dot_general(
        dqkv, xn, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    dbqkv_ref[...] += jnp.sum(dqkv.astype(f32), axis=1, keepdims=True)
    dxn = jax.lax.dot_general(
        wqkvt_ref[...], dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dx_ref[0] = dxn.reshape(c, t_len, n).astype(dx_ref.dtype)


def _core_chunk(t_len: int, n: int, c: int, budget: int = int(60e6)) -> int:
    """Tokens per grid step for the streamed core: lane-aligned (multiple
    of 128), dividing ``n``, per-step working set ~50*C*T*chunk bytes
    (qkv/q/kv/dkv scratches + x/dao/dx windows + f32 attention live set)
    under ``budget``."""
    if n % 128:
        return n
    nk = n // 128
    per = 50 * c * t_len * 128
    k = max(1, min(nk, budget // per))
    while nk % k:
        k -= 1
    return 128 * k


def core_temporal_supported(t_len: int, h: int, w: int, c: int) -> bool:
    """Gate for the streamed temporal core (used when the whole-branch
    megakernel's envelope is exceeded, e.g. avit_big's C=768 at 32x32)."""
    n = h * w
    if n % 128 or c % 8:
        return False
    # The smallest chunk (128 tokens) must fit the per-step budget.
    return 50 * c * t_len * 128 <= int(100e6)


@functools.lru_cache(maxsize=None)
def _make_temporal_core(
    b: int, t_len: int, n: int, nc: int, heads: int, d: int,
    dtype_name: str, interpret: bool,
):
    dtype = jnp.dtype(dtype_name)
    c = heads * d
    tnc = t_len * nc
    grid = (b, n // nc)

    x_spec = pl.BlockSpec(
        (1, c, t_len, nc), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, (lambda i, j: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    in_specs = [
        x_spec, const((3 * c, c)), const((3 * c, 1)), const((d, 4)),
        const((heads * t_len, tnc)), const((c, 1)),
    ]
    kdims = dict(t_len=t_len, n=nc, heads=heads, d=d)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    fwd_call = pl.pallas_call(
        functools.partial(_core_fwd_kernel, **kdims),
        grid=grid,
        in_specs=in_specs,
        out_specs=[x_spec],
        out_shape=[jax.ShapeDtypeStruct((b, c, t_len, n), dtype)],
        scratch_shapes=[
            pltpu.VMEM((3 * c, tnc), dtype),
            pltpu.VMEM((c, tnc), dtype),
            pltpu.VMEM((2 * c, tnc), dtype),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_core_bwd_kernel, **kdims),
        grid=grid,
        in_specs=in_specs + [x_spec],
        out_specs=[
            x_spec, const((3 * c, c)), const((3 * c, 1)), const((d, 4)),
            const((heads * t_len, tnc)), const((heads, tnc)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, t_len, n), dtype),
            jax.ShapeDtypeStruct((3 * c, c), jnp.float32),
            jax.ShapeDtypeStruct((3 * c, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, 4), jnp.float32),
            jax.ShapeDtypeStruct((heads * t_len, tnc), jnp.float32),
            jax.ShapeDtypeStruct((heads, tnc), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3 * c, tnc), dtype),
            pltpu.VMEM((c, tnc), dtype),
            pltpu.VMEM((2 * c, tnc), dtype),
            pltpu.VMEM((2 * c, tnc), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(x, wqkvt, bqkv, ln, bias, scol):
        (ao,) = fwd_call(x, wqkvt, bqkv, ln, bias, scol)
        return ao

    def fused_fwd(x, wqkvt, bqkv, ln, bias, scol):
        (ao,) = fwd_call(x, wqkvt, bqkv, ln, bias, scol)
        return ao, (x, wqkvt, bqkv, ln, bias, scol)

    def fused_bwd(res, dao):
        x, wqkvt, bqkv, ln, bias, scol = res
        dx, dwqkvt, dbqkv, dln, dbias_w, dscale_w = bwd_call(
            x, wqkvt, bqkv, ln, bias, scol, dao
        )
        d = x.shape[1] // dscale_w.shape[0]
        dscol = jnp.repeat(
            jnp.sum(dscale_w, axis=1, keepdims=True), d, axis=0
        ) / jnp.float32(d)
        return dx, dwqkvt, dbqkv, dln, dbias_w, dscol

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def core_temporal_attention(
    xn: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    qn_scale: jax.Array,
    qn_bias: jax.Array,
    kn_scale: jax.Array,
    kn_bias: jax.Array,
    bias: jax.Array | None = None,
    scale_factor: jax.Array | None = None,
    heads: int | None = None,
    interpret: bool | None = None,
    chunk: int | None = None,
) -> jax.Array:
    """QKV projection + qk-LN + T x T attention, streamed over token chunks.

    ``xn``: ``(B, T, H, W, C)`` — the InstanceNorm1 output (IN1/IN2/output
    Dense stay in XLA, unlike :func:`mega_temporal_block`, so the per-step
    VMEM working set is independent of the token count).  Returns the
    attn_scale-blended attention output in the input layout — numerically
    the reference chain ``attention.py:44-101`` between the norms.
    ``chunk`` overrides the per-grid-step token count (testing hook).
    """
    b, t_len, h, w, c = xn.shape
    if heads is None:
        raise ValueError("heads must be given")
    d = c // heads
    n = h * w
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nc = chunk or (n if interpret else _core_chunk(t_len, n, c))

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
    i_idx = jnp.arange(t_len)
    scale = (
        jnp.ones((heads,), f32)
        if scale_factor is None
        else scale_factor.astype(f32)
    )
    if bias is None:
        bias_t = jnp.zeros((heads * t_len, t_len * nc), f32)
    else:
        rows = [
            bias.astype(f32)[:, i_idx, (i_idx + r) % t_len]
            for r in range(t_len)
        ]
        bias_t = jnp.repeat(
            jnp.stack(rows, axis=0).reshape(t_len * heads, t_len), nc, axis=1
        )
    scol = jnp.repeat(scale.reshape(heads, 1), d, axis=0)

    dtype = xn.dtype
    xt = xn.reshape(b, t_len, n, c).transpose(0, 3, 1, 2)  # (B, C, T, N)
    fused = _make_temporal_core(
        b, t_len, n, nc, heads, d, str(dtype), bool(interpret)
    )
    ao = fused(
        xt,
        wqkv.astype(dtype).T,
        bqkv.astype(f32).reshape(3 * c, 1),
        ln,
        bias_t,
        scol,
    )
    out = ao.transpose(0, 2, 3, 1).reshape(b, t_len, h, w, c)
    return jax.ad_checkpoint.checkpoint_name(out, "flash_attn")


def mega_temporal_supported(t_len: int, h: int, w: int, c: int) -> bool:
    """Shape gate for routing ``attn_impl='auto'`` to the megakernel.

    The backward kernel keeps qkv/q/kv scratches plus rolled slab
    temporaries resident per grid step; require the working set to fit the
    128 MiB VMEM budget with headroom, and keep lane counts sublane-aligned
    so the circular rolls stay on fast paths.  Anything outside the envelope
    falls back to the XLA ``unrolled`` path (correct at every shape).
    """
    n = h * w
    tn = t_len * n
    if n % 128 != 0:
        return False
    # bwd budget at the measured flagship point (C=384, T*N=25600 ->
    # ~114 MiB program total): declared scratches 22*C*TN bytes (7C rows
    # bf16 + 2C rows f32), in/out windows ~16*C*TN (x/ao/do/dx double-
    # buffered bf16), register live set ~20*C*TN (q + dq f32 + roll
    # temporaries).  58*C*TN + margin must fit the 128 MiB VMEM space.
    bytes_needed = 58 * c * tn
    return bytes_needed <= int(118e6)


@functools.lru_cache(maxsize=None)
def _make_temporal_block(
    b: int, t_len: int, n: int, heads: int, d: int,
    dtype_name: str, interpret: bool, flat: bool = False,
):
    dtype = jnp.dtype(dtype_name)
    c = heads * d
    tn = t_len * n
    grid = (b,)

    if flat:
        # Channel-major carry (models/axial_vit.py carry="cm"): activations
        # arrive as one flat (1, C, B*T*N) tensor and each grid step windows
        # tn lanes — the kernel body is unchanged (block shape identical),
        # only the index map and array shape differ, which is what deletes
        # the per-block NHWC <-> (C, T*N) boundary transposes.
        x_spec = pl.BlockSpec(
            (1, c, tn), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        x_shape = (1, c, b * tn)
    else:
        x_spec = pl.BlockSpec(
            (1, c, tn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        x_shape = (b, c, tn)
    const = lambda shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    in_specs = [
        x_spec, const((c, 2)), const((3 * c, c)), const((3 * c, 1)),
        const((d, 4)), const((c, 2)), const((c, c)), const((c, 1)),
        const((heads * t_len, tn)), const((c, 1)),
    ]
    kdims = dict(t_len=t_len, n=n, heads=heads, d=d)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **kdims),
        grid=grid,
        in_specs=in_specs,
        out_specs=[x_spec, x_spec],
        out_shape=[
            jax.ShapeDtypeStruct(x_shape, dtype),
            jax.ShapeDtypeStruct(x_shape, dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((3 * c, tn), dtype),
            pltpu.VMEM((c, tn), dtype),
            pltpu.VMEM((2 * c, tn), dtype),
            pltpu.VMEM((c, tn), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, **kdims),
        grid=grid,
        in_specs=in_specs + [x_spec, x_spec],
        out_specs=[
            x_spec, const((c, 2)), const((3 * c, c)), const((3 * c, 1)),
            const((d, 4)), const((c, 2)), const((c, c)), const((c, 1)),
            const((heads * t_len, tn)), const((heads, tn)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x_shape, dtype),
            jax.ShapeDtypeStruct((c, 2), jnp.float32),
            jax.ShapeDtypeStruct((3 * c, c), jnp.float32),
            jax.ShapeDtypeStruct((3 * c, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, 4), jnp.float32),
            jax.ShapeDtypeStruct((c, 2), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((heads * t_len, tn), jnp.float32),
            jax.ShapeDtypeStruct((heads, tn), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3 * c, tn), dtype),
            pltpu.VMEM((c, tn), dtype),
            pltpu.VMEM((2 * c, tn), dtype),
            pltpu.VMEM((c, tn), dtype),
            pltpu.VMEM((2 * c, tn), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(x, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias, scol):
        out, _ = fwd_call(x, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias,
                          scol)
        return out

    def fused_fwd(x, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias, scol):
        out, ao = fwd_call(x, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias,
                           scol)
        return out, (x, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias, scol,
                     ao)

    def fused_bwd(res, do):
        (x, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias, scol, ao) = res
        (dx, din1, dwqkvt, dbqkv, dln, din2, dwoutt, dbout, dbias_w,
         dscale_w) = bwd_call(x, in1, wqkvt, bqkv, ln, in2, woutt, bout,
                              bias, scol, ao, do)
        # The kernel leaves the attn-scale gradient as wide (heads, T*N)
        # rows; finish the lane reduction and broadcast back to the
        # per-head-constant (C, 1) column primal here in XLA.
        d = x.shape[1] // dscale_w.shape[0]
        dscol = jnp.repeat(
            jnp.sum(dscale_w, axis=1, keepdims=True), d, axis=0
        ) / jnp.float32(d)
        return (dx, din1, dwqkvt, dbqkv, dln, din2, dwoutt, dbout, dbias_w,
                dscol)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def mega_temporal_block(
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
    bias: jax.Array | None = None,
    scale_factor: jax.Array | None = None,
    heads: int | None = None,
    interpret: bool | None = None,
    cm_dims: tuple[int, int] | None = None,
) -> jax.Array:
    """Whole temporal-attention branch in one kernel launch.

    ``x``: ``(B, T, H, W, C)`` block input.  Returns the branch output after
    the output Dense — numerically equal to
    ``Dense(IN2(attn_T(qkLN(split(Dense(IN1(x)))))))`` with flax/torch
    semantics for every stage (reference chain
    ``bubbleformer/layers/attention.py:26-117``).  The kernel works in the
    transposed ``(C, T*N)`` layout; this wrapper does the (cheap, XLA-side)
    relayout, the T5-bias lane-table and attn-scale column precomputation,
    and the final reduction of the wide bias/scale gradient rows.

    ``cm_dims=(B, T)``: channel-major carry mode — ``x`` is the flat
    ``(C, B*T*N)`` activation (the carry layout of
    ``models/axial_vit.py`` ``carry="cm"``), which is ALREADY the kernel's
    native layout, so the boundary transposes above disappear and the
    output is returned flat.
    """
    if cm_dims is not None:
        b, t_len = cm_dims
        c, btn = x.shape
        n = btn // (b * t_len)
    else:
        b, t_len, h, w, c = x.shape
        n = h * w
    if heads is None:
        raise ValueError("heads must be given")
    d = c // heads
    tn = t_len * n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    f32 = jnp.float32
    in1 = jnp.stack([in1_scale.astype(f32), in1_bias.astype(f32)], axis=1)
    in2 = jnp.stack([in2_scale.astype(f32), in2_bias.astype(f32)], axis=1)
    ln = jnp.stack(
        [
            qn_scale.astype(f32),
            qn_bias.astype(f32),
            kn_scale.astype(f32),
            kn_bias.astype(f32),
        ],
        axis=1,
    )
    i_idx = jnp.arange(t_len)
    scale = (
        jnp.ones((heads,), f32)
        if scale_factor is None
        else scale_factor.astype(f32)
    )

    if cm_dims is not None:
        xt = x.reshape(1, c, b * tn)  # free: adds a unit leading dim
    else:
        xt = x.reshape(b, tn, c).transpose(0, 2, 1)
    dtype = x.dtype
    fused = _make_temporal_block(
        b, t_len, n, heads, d, str(dtype), bool(interpret),
        flat=cm_dims is not None,
    )

    # Wrap the kernel so bias/scale enter/leave in their module-native
    # shapes: the per-offset T5 lane table (row r*heads + hd carries
    # bias[hd, i, (i+r) % T] over the N lanes of each i block) and the
    # per-head-constant (C, 1) scale column are built under autodiff, so
    # their parameter gradients come out of the table/column VJPs.
    def branch(xt, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias_p, scale_p):
        if bias_p is None:
            bias_t = jnp.zeros((heads * t_len, tn), f32)
        else:
            rows = [
                bias_p.astype(f32)[:, i_idx, (i_idx + r) % t_len]
                for r in range(t_len)
            ]
            bias_t = jnp.repeat(
                jnp.stack(rows, axis=0).reshape(t_len * heads, t_len), n,
                axis=1,
            )
        scol = jnp.repeat(scale_p.reshape(heads, 1), d, axis=0)
        return fused(xt, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias_t,
                     scol)

    out_t = branch(
        xt,
        in1,
        wqkv.astype(dtype).T,
        bqkv.astype(f32).reshape(3 * c, 1),
        ln,
        in2,
        wout.astype(dtype).T,
        bout.astype(f32).reshape(c, 1),
        bias,
        scale,
    )
    if cm_dims is not None:
        out = out_t.reshape(c, b * tn)
    else:
        out = out_t.transpose(0, 2, 1).reshape(b, t_len, h, w, c)
    return jax.ad_checkpoint.checkpoint_name(out, "flash_attn")

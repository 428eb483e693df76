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
(tokens along lanes, channels along sublanes), which makes every stage of
this tiny-sequence attention natural for the hardware:

* the projections become stationary-weight MXU matmuls
  ``W^T (3C, C) @ x (C, T*N)`` with ideal dimensions;
* InstanceNorm / qk-LayerNorm statistics are single lane- or sublane-block
  reductions over the whole image — no per-``t`` or per-head loop;
* the T x T attention is batched over lanes with **lane rolls**: rolling
  ``k``/``v`` left by ``r*N`` lanes aligns timestep ``(i+r) mod T`` under
  timestep ``i``, so ONE multiply + sublane-reduce per offset ``r`` computes
  the logits of every (position, i, j=(i+r)%T) pair at once — 5 rolled ops
  replace the 25-pair unroll, and the T5 bias becomes a precomputed
  per-offset lane table;
* ``attn_scale`` window-mean blending, softmax and the probability-weighted
  sum are all full-width (1, T*N) / (d, T*N) VPU ops.

The backward pass is fully hand-written in a second kernel: it recomputes
the cheap forward chain flash-style (the attention output ``ao`` is saved as
a second forward output to skip the IN2-input recompute), re-rolls the
gradients back (``dk = sum_r roll(dl_r * q, +r*N)``), and accumulates every
weight gradient in VMEM across the sequential batch grid — the pattern
established by the axial megakernel (``ops/axial_block_mega.py``).  Bias and
attn-scale gradients leave the kernel as wide per-lane rows that XLA reduces
(cheap, once per block).

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
    (y, xhat, inv) with xhat/inv in f32, per-t lane blocks."""
    ys, xhats, invs = [], [], []
    for t in range(t_len):
        xt = x_t[:, t * n : (t + 1) * n].astype(jnp.float32)
        mu = jnp.mean(xt, axis=1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xt * xt, axis=1, keepdims=True) - mu * mu, 0.0
        )
        inv = jax.lax.rsqrt(var + _IN_EPS)
        xhat = (xt - mu) * inv
        ys.append(xhat * aff_ref[:, 0:1] + aff_ref[:, 1:2])
        xhats.append(xhat)
        invs.append(inv)
    return ys, xhats, invs


def _in_bwd_t(dy, xhat, inv, aff_ref):
    """InstanceNorm backward for one t lane block in (C, N) layout."""
    dg = dy * aff_ref[:, 0:1]
    m1 = jnp.mean(dg, axis=1, keepdims=True)
    m2 = jnp.mean(dg * xhat, axis=1, keepdims=True)
    return inv * (dg - m1 - xhat * m2)


def _roll_left(x, r, n, t_len):
    """Circular lane roll moving block i+r under block i (non-negative-shift
    form required by pltpu.roll)."""
    return pltpu.roll(x, shift=(t_len - r) * n, axis=1) if r else x


def _roll_right(x, r, n, t_len):
    """Inverse of :func:`_roll_left`."""
    return pltpu.roll(x, shift=r * n, axis=1) if r else x


def _qkln_rows(qkv_s, ln_ref, hd, d, which):
    """qk-LayerNorm over the d sublanes of one head's q or k row block.

    ``which``: 0 for q (affine cols 0/1), 1 for k (affine cols 2/3).
    Returns (normed bf16-ready rows, xhat f32, inv f32 (1, T*N))."""
    base = hd * 3 * d + which * d
    raw = qkv_s[base : base + d, :].astype(jnp.float32)
    mu = jnp.mean(raw, axis=0, keepdims=True)
    var = jnp.maximum(jnp.mean(raw * raw, axis=0, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (raw - mu) * inv
    y = xhat * ln_ref[:, 2 * which : 2 * which + 1] + ln_ref[
        :, 2 * which + 1 : 2 * which + 2
    ]
    return y, xhat, inv


def _head_attention_fwd(qkv_s, ln_ref, bias_ref, scale_ref, hd, t_len, n, d,
                        save=None):
    """T x T attention for one head in (d, T*N) layout via lane rolls.

    Returns (o, p_list, vroll_list, pv, vmean) — o is the attn_scale-blended
    (d, T*N) f32 output; the rest are reused by the backward.  If ``save`` is
    given as (qhat_s, khat_s, inv_s), LN residuals are stored for the bwd.
    """
    scaling = d**-0.5
    q, qhat, qinv = _qkln_rows(qkv_s, ln_ref, hd, d, 0)
    k, khat, kinv = _qkln_rows(qkv_s, ln_ref, hd, d, 1)
    v = qkv_s[hd * 3 * d + 2 * d : hd * 3 * d + 3 * d, :].astype(jnp.float32)
    if save is not None:
        qhat_s, khat_s, inv_s = save
        qhat_s[hd * d : (hd + 1) * d, :] = qhat
        khat_s[hd * d : (hd + 1) * d, :] = khat
        inv_s[2 * hd : 2 * hd + 1, :] = qinv
        inv_s[2 * hd + 1 : 2 * hd + 2, :] = kinv

    logits, vrolls = [], []
    for r in range(t_len):
        kr = _roll_left(k, r, n, t_len)
        vrolls.append(_roll_left(v, r, n, t_len))
        l = jnp.sum(q * kr, axis=0, keepdims=True) * scaling
        logits.append(l + bias_ref[hd * t_len + r : hd * t_len + r + 1, :])
    m = logits[0]
    for r in range(1, t_len):
        m = jnp.maximum(m, logits[r])
    exps = [jnp.exp(l - m) for l in logits]
    z = exps[0]
    for r in range(1, t_len):
        z = z + exps[r]
    inv_z = 1.0 / z
    p_list = [e * inv_z for e in exps]

    pv = p_list[0] * vrolls[0]
    vmean = vrolls[0]
    for r in range(1, t_len):
        pv = pv + p_list[r] * vrolls[r]
        vmean = vmean + vrolls[r]
    vmean = vmean * (1.0 / t_len)
    s = scale_ref[hd, 0]
    o = s * pv + (1.0 - s) * vmean
    return o, p_list, vrolls, pv, vmean, q, k


def _fwd_kernel(
    scale_ref, x_ref, in1_ref, wqkvt_ref, bqkv_ref, ln_ref, in2_ref,
    woutt_ref, bout_ref, bias_ref, o_ref, ao_ref, qkv_s, ao_s,
    *, t_len, n, heads, d,
):
    c = heads * d

    # InstanceNorm1 + one stationary-weight QKV matmul (3C, C) @ (C, T*N).
    xn_blocks, _, _ = _in_fwd_t(x_ref[0], in1_ref, t_len, n)
    xn = jnp.concatenate(xn_blocks, axis=1).astype(qkv_s.dtype)
    qkv_s[...] = (
        jax.lax.dot_general(
            wqkvt_ref[...], xn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...]
    ).astype(qkv_s.dtype)

    for hd in range(heads):
        o = _head_attention_fwd(
            qkv_s, ln_ref, bias_ref, scale_ref, hd, t_len, n, d
        )[0]
        ao_s[hd * d : (hd + 1) * d, :] = o

    ao_ref[0] = ao_s[...].astype(ao_ref.dtype)
    y2_blocks, _, _ = _in_fwd_t(ao_s[...], in2_ref, t_len, n)
    y2 = jnp.concatenate(y2_blocks, axis=1).astype(qkv_s.dtype)
    out = jax.lax.dot_general(
        woutt_ref[...], y2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bout_ref[...]
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(
    scale_ref, x_ref, in1_ref, wqkvt_ref, bqkv_ref, ln_ref, in2_ref,
    woutt_ref, bout_ref, bias_ref, ao_ref, do_ref,
    dx_ref, din1_ref, dwqkvt_ref, dbqkv_ref, dln_ref, din2_ref,
    dwoutt_ref, dbout_ref, dbias_ref, dscale_ref,
    qkv_s, dqkv_s, dao_s, qhat_s, khat_s, inv_s,
    *, t_len, n, heads, d,
):
    b = pl.program_id(0)
    c = heads * d
    scaling = d**-0.5

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

    # ---- Recompute IN1 + QKV (flash-style) ----
    xn_blocks, xhat1s, inv1s = _in_fwd_t(x_ref[0], in1_ref, t_len, n)
    xn = jnp.concatenate(xn_blocks, axis=1).astype(qkv_s.dtype)
    qkv_s[...] = (
        jax.lax.dot_general(
            wqkvt_ref[...], xn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[...]
    ).astype(qkv_s.dtype)

    # ---- Output Dense + InstanceNorm2 backward -> dao ----
    y2_blocks, xhat2s, inv2s = _in_fwd_t(ao_ref[0], in2_ref, t_len, n)
    y2 = jnp.concatenate(y2_blocks, axis=1).astype(qkv_s.dtype)
    do = do_ref[0]
    # dW_out^T (C, C) = do (C, T*N) @ y2 (C, T*N)^T  (contract lanes).
    dwoutt_ref[...] += jax.lax.dot_general(
        do, y2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbout_ref[...] += jnp.sum(do.astype(jnp.float32), axis=1, keepdims=True)
    # dy2 (C, T*N) = W_out (C, C) @ do: contract the out-channel dim of both.
    dy2 = jax.lax.dot_general(
        woutt_ref[...], do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for t in range(t_len):
        sl = slice(t * n, (t + 1) * n)
        dy2_t = dy2[:, sl]
        din2_ref[:, 0:1] += jnp.sum(dy2_t * xhat2s[t], axis=1, keepdims=True)
        din2_ref[:, 1:2] += jnp.sum(dy2_t, axis=1, keepdims=True)
        dao_s[:, sl] = _in_bwd_t(dy2_t, xhat2s[t], inv2s[t], in2_ref)

    # ---- Attention + qk-LN backward per head ----
    for hd in range(heads):
        _, p_list, vrolls, pv, vmean, q, k = _head_attention_fwd(
            qkv_s, ln_ref, bias_ref, scale_ref, hd, t_len, n, d,
            save=(qhat_s, khat_s, inv_s),
        )
        s = scale_ref[hd, 0]
        dao_h = dao_s[hd * d : (hd + 1) * d, :]
        # attn_scale: o = s*pv + (1-s)*vmean; ds leaves as a wide lane row.
        dscale_ref[hd : hd + 1, :] += jnp.sum(
            dao_h * (pv - vmean), axis=0, keepdims=True
        )
        dpv = s * dao_h
        dp_list = [
            jnp.sum(dpv * vrolls[r], axis=0, keepdims=True)
            for r in range(t_len)
        ]
        inner = p_list[0] * dp_list[0]
        for r in range(1, t_len):
            inner = inner + p_list[r] * dp_list[r]

        dq = None
        dk = None
        dv = None
        for r in range(t_len):
            dl = p_list[r] * (dp_list[r] - inner)  # (1, T*N) f32
            dbias_ref[hd * t_len + r : hd * t_len + r + 1, :] += dl
            kr = _roll_left(k, r, n, t_len)
            dq_c = dl * kr * scaling
            dq = dq_c if dq is None else dq + dq_c
            dk_c = _roll_right(dl * q * scaling, r, n, t_len)
            dk = dk_c if dk is None else dk + dk_c
            dv_c = _roll_right(p_list[r] * dpv, r, n, t_len)
            dv = dv_c if dv is None else dv + dv_c
        # vmean backward: every j receives (1-s)/T * sum_i dao_i.
        bsum = dao_h[:, 0:n]
        for t in range(1, t_len):
            bsum = bsum + dao_h[:, t * n : (t + 1) * n]
        bsum = bsum * ((1.0 - s) / t_len)
        dv = dv + jnp.concatenate([bsum] * t_len, axis=1)

        # qk-LayerNorm backward over the d sublanes (no t loop needed).
        base = hd * 3 * d
        for which, dy, xhat, col in (
            (0, dq, qhat_s[hd * d : (hd + 1) * d, :], 0),
            (1, dk, khat_s[hd * d : (hd + 1) * d, :], 2),
        ):
            dln_ref[:, col : col + 1] += jnp.sum(
                dy * xhat, axis=1, keepdims=True
            )
            dln_ref[:, col + 1 : col + 2] += jnp.sum(dy, axis=1, keepdims=True)
            dyg = dy * ln_ref[:, col : col + 1]
            m1 = jnp.mean(dyg, axis=0, keepdims=True)
            m2 = jnp.mean(dyg * xhat, axis=0, keepdims=True)
            inv = inv_s[2 * hd + which : 2 * hd + which + 1, :]
            dqkv_s[base + which * d : base + (which + 1) * d, :] = (
                inv * (dyg - m1 - xhat * m2)
            ).astype(dqkv_s.dtype)
        dqkv_s[base + 2 * d : base + 3 * d, :] = dv.astype(dqkv_s.dtype)

    # ---- QKV Dense + InstanceNorm1 backward -> dx ----
    dqkv = dqkv_s[...]
    # dW_qkv^T (3C, C) = dqkv (3C, T*N) @ xn (C, T*N)^T (contract lanes).
    dwqkvt_ref[...] += jax.lax.dot_general(
        dqkv, xn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=1, keepdims=True)
    # dxn (C, T*N) = W_qkv^T^T @ dqkv: contract the 3C dim of both.
    dxn = jax.lax.dot_general(
        wqkvt_ref[...], dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for t in range(t_len):
        sl = slice(t * n, (t + 1) * n)
        dxn_t = dxn[:, sl]
        din1_ref[:, 0:1] += jnp.sum(dxn_t * xhat1s[t], axis=1, keepdims=True)
        din1_ref[:, 1:2] += jnp.sum(dxn_t, axis=1, keepdims=True)
        dx_ref[0, :, sl] = _in_bwd_t(
            dxn_t, xhat1s[t], inv1s[t], in1_ref
        ).astype(dx_ref.dtype)


def mega_temporal_supported(t_len: int, h: int, w: int, c: int) -> bool:
    """Shape gate for routing ``attn_impl='auto'`` to the megakernel.

    The backward kernel keeps ~6 (C- or 3C-row, T*N-lane) scratches plus the
    in/out blocks resident per grid step; require the working set to fit the
    128 MiB VMEM budget with headroom, and keep lane counts sublane-aligned
    so the circular rolls stay on fast paths.  Anything outside the envelope
    falls back to the XLA ``unrolled`` path (correct at every shape).
    """
    n = h * w
    tn = t_len * n
    if n % 128 != 0:
        return False
    # bwd working set: qkv + dqkv (3C, T*N) bf16, dao/qhat/khat (C, T*N)
    # f32, x/ao/do/dx blocks (C, T*N) bf16, weights and wide grad rows.
    bytes_needed = (
        2 * (3 * c) * tn * 2
        + 3 * c * tn * 4
        + 4 * c * tn * 2
        + (3 * c * c + c * c) * 2
        + 2 * (3 * c * c + c * c) * 4
    )
    return bytes_needed <= int(100e6)


@functools.lru_cache(maxsize=None)
def _make_temporal_block(
    b: int, t_len: int, n: int, heads: int, d: int,
    dtype_name: str, interpret: bool,
):
    dtype = jnp.dtype(dtype_name)
    c = heads * d
    tn = t_len * n
    grid = (b,)

    x_spec = pl.BlockSpec(
        (1, c, tn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        x_spec, const((c, 2)), const((3 * c, c)), const((3 * c, 1)),
        const((d, 4)), const((c, 2)), const((c, c)), const((c, 1)),
        const((heads * t_len, tn)),
    ]
    kdims = dict(t_len=t_len, n=n, heads=heads, d=d)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **kdims),
        grid=grid,
        in_specs=in_specs,
        out_specs=[x_spec, x_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, tn), dtype),
            jax.ShapeDtypeStruct((b, c, tn), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((3 * c, tn), dtype),
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
            jax.ShapeDtypeStruct((b, c, tn), dtype),
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
            pltpu.VMEM((3 * c, tn), dtype),
            pltpu.VMEM((c, tn), jnp.float32),
            pltpu.VMEM((c, tn), jnp.float32),
            pltpu.VMEM((c, tn), jnp.float32),
            pltpu.VMEM((2 * heads, tn), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )

    @jax.custom_vjp
    def fused(x, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias, scale):
        out, _ = fwd_call(scale, x, in1, wqkvt, bqkv, ln, in2, woutt, bout,
                          bias)
        return out

    def fused_fwd(x, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias, scale):
        out, ao = fwd_call(scale, x, in1, wqkvt, bqkv, ln, in2, woutt, bout,
                           bias)
        return out, (x, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias, scale,
                     ao)

    def fused_bwd(res, do):
        (x, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias, scale, ao) = res
        (dx, din1, dwqkvt, dbqkv, dln, din2, dwoutt, dbout, dbias_w,
         dscale_w) = bwd_call(scale, x, in1, wqkvt, bqkv, ln, in2, woutt,
                              bout, bias, ao, do)
        # The kernel leaves the attn-scale gradient as wide per-lane rows;
        # finish the lane reduction here (XLA, fused into the surrounding
        # backward).  dbias_w already matches the lane-table primal shape.
        return (dx, din1, dwqkvt, dbqkv, dln, din2, dwoutt, dbout, dbias_w,
                jnp.sum(dscale_w, axis=1, keepdims=True))

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
) -> jax.Array:
    """Whole temporal-attention branch in one kernel launch.

    ``x``: ``(B, T, H, W, C)`` block input.  Returns the branch output after
    the output Dense — numerically equal to
    ``Dense(IN2(attn_T(qkLN(split(Dense(IN1(x)))))))`` with flax/torch
    semantics for every stage (reference chain
    ``bubbleformer/layers/attention.py:26-117``).  The kernel works in the
    transposed ``(C, T*N)`` layout; this wrapper does the (cheap, XLA-side)
    relayout, T5-bias lane-table precomputation and the final reduction of
    the wide bias/scale gradient rows.
    """
    b, t_len, h, w, c = x.shape
    if heads is None:
        raise ValueError("heads must be given")
    d = c // heads
    n = h * w
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
    # Per-offset T5 bias lane table: row (hd*T + r) carries bias[hd, i,
    # (i+r) % T] broadcast over the N lanes of each i block (built inside
    # ``branch`` so the table construction sits under autodiff).
    i_idx = jnp.arange(t_len)
    scale = (
        jnp.ones((heads, 1), f32)
        if scale_factor is None
        else scale_factor.astype(f32).reshape(heads, 1)
    )

    xt = x.reshape(b, tn, c).transpose(0, 2, 1)
    dtype = x.dtype
    fused = _make_temporal_block(
        b, t_len, n, heads, d, str(dtype), bool(interpret)
    )

    # Wrap the kernel so bias/scale enter/leave in their module-native
    # shapes; the wide-row gradient reduction and the T5 (i, j) remap happen
    # here in XLA (once per block backward, trivially fused).
    def branch(xt, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias_p, scale_p):
        if bias_p is None:
            bias_t = jnp.zeros((heads * t_len, tn), f32)
        else:
            rows = [
                bias_p.astype(f32)[:, i_idx, (i_idx + r) % t_len]
                for r in range(t_len)
            ]
            bias_t = jnp.repeat(
                jnp.stack(rows, axis=1).reshape(heads * t_len, t_len), n,
                axis=1,
            )
        return fused(xt, in1, wqkvt, bqkv, ln, in2, woutt, bout, bias_t,
                     scale_p)

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
    out = out_t.transpose(0, 2, 1).reshape(b, t_len, h, w, c)
    return jax.ad_checkpoint.checkpoint_name(out, "flash_attn")
